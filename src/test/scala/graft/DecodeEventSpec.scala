package graft

import graft.evm.{AbiCodec, AbiSchema, LogPipeline}
import org.apache.spark.sql.functions._
import java.math.BigInteger

/** Generic ABI event decode over the Uniswap-pool Swap shape
  * (`abi/pool.json` in the reference): int256 amounts (negative),
  * uint160 sqrtPriceX96 above 38 digits (→ null + data_hex shadow,
  * SURVEY §7.4), uint128 liquidity, int24 tick. */
class DecodeEventSpec extends SparkSpec {
  import spark.implicits._

  private val swapJson =
    """[{"type":"event","name":"Swap","inputs":[
        {"indexed":true,"name":"sender","type":"address"},
        {"indexed":true,"name":"recipient","type":"address"},
        {"indexed":false,"name":"amount0","type":"int256"},
        {"indexed":false,"name":"amount1","type":"int256"},
        {"indexed":false,"name":"sqrtPriceX96","type":"uint160"},
        {"indexed":false,"name":"liquidity","type":"uint128"},
        {"indexed":false,"name":"tick","type":"int24"}]}]"""

  test("decodeEvent: Swap roundtrip with uint160 overflow policy") {
    val ev = AbiSchema.parse(swapJson).head
    assert(ev.signature == "Swap(address,address,int256,int256,uint160,uint128,int24)")

    val sender = "0x00000000000000000000000000000000000000aa"
    val recipient = "0x00000000000000000000000000000000000000bb"
    // sqrtPriceX96 near uint160 max: 49 digits, beyond Decimal(38,0)
    val sqrtPrice = BigInteger.valueOf(2).pow(159)
    val data = AbiCodec.encodeData(
      Seq(BigInteger.valueOf(-1000), BigInteger.valueOf(2000), sqrtPrice,
        BigInteger.valueOf(12345678901L), BigInteger.valueOf(-887272)),
      Seq("int256", "int256", "uint160", "uint128", "int24"))

    val logs = Seq((
        "0xtx1", 7L, "0xpool",
        ev.topic0,
        AbiCodec.encodeWord(sender, "address"),
        AbiCodec.encodeWord(recipient, "address"),
        data))
      .toDF("tx_hash", "block_number", "address", "topic0", "topic1", "topic2", "data")

    val out = LogPipeline.decodeEvent(logs, ev, "Pool", "1").head()
    assert(out.getAs[String]("event_name") == "Swap")
    assert(out.getAs[String]("sender") == sender)
    assert(out.getAs[String]("recipient") == recipient)
    assert(out.getDecimal(out.fieldIndex("amount0")).longValueExact() == -1000L)
    assert(out.getDecimal(out.fieldIndex("amount1")).longValueExact() == 2000L)
    // overflow → null, but the raw payload survives in data_hex
    assert(out.isNullAt(out.fieldIndex("sqrtPriceX96")))
    assert(out.getAs[String]("data_hex").contains(sqrtPrice.toString(16)))
    assert(out.getDecimal(out.fieldIndex("liquidity")).longValueExact() == 12345678901L)
    assert(out.getDecimal(out.fieldIndex("tick")).longValueExact() == -887272L)
  }

  test("decodeEvent filters non-matching topic0 (P3 dispatch)") {
    val ev = AbiSchema.parse(swapJson).head
    val logs = Seq(("0xtx", 1L, "0xpool", "0xwrongtopic",
        AbiCodec.encodeWord("0x" + "00" * 20, "address"),
        AbiCodec.encodeWord("0x" + "00" * 20, "address"),
        Array[Byte]()))
      .toDF("tx_hash", "block_number", "address", "topic0", "topic1", "topic2", "data")
    assert(LogPipeline.decodeEvent(logs, ev, "Pool", "1").count() == 0)
  }
}
