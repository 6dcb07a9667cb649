package graft

import graft.evm.{Keccak, Rlp, Secp256k1, TxSender}
import java.math.BigInteger
import org.scalatest.funsuite.AnyFunSuite

/** RLP encoding pinned against the public spec's own test vectors,
  * plus the legacy-transaction sighash → sender recovery loop. */
class RlpSpec extends AnyFunSuite {
  import Rlp._

  private def hex(b: Array[Byte]): String = Keccak.hex(b)

  test("RLP spec vectors") {
    assert(hex(encode(Str("dog".getBytes))) == "83646f67")
    assert(hex(encode(Lst(Seq(Str("cat".getBytes), Str("dog".getBytes)))))
      == "c88363617483646f67")
    assert(hex(encode(Str(Array.empty))) == "80")
    assert(hex(encode(Lst(Seq.empty))) == "c0")
    assert(hex(encode(int(0L))) == "80")
    assert(hex(encode(int(15L))) == "0f")
    assert(hex(encode(int(1024L))) == "820400")
    // single byte < 0x80 encodes as itself
    assert(hex(encode(Str(Array(0x7f.toByte)))) == "7f")
    // 56+ byte string takes the long form: 0xb8 <len> <payload>
    val lorem = ("Lorem ipsum dolor sit amet, consectetur adipisicing elit")
      .getBytes("UTF-8")
    assert(lorem.length == 56)
    assert(hex(encode(Str(lorem))).startsWith("b838" + "4c6f72656d"))
    // nested empty lists: [ [], [[]], [ [], [[]] ] ]
    val nested = Lst(Seq(Lst(Seq.empty), Lst(Seq(Lst(Seq.empty))),
      Lst(Seq(Lst(Seq.empty), Lst(Seq(Lst(Seq.empty)))))))
    assert(hex(encode(nested)) == "c7c0c1c0c3c0c1c0")
  }

  test("legacy tx: sign over the EIP-155 sighash, recover the sender") {
    val priv = new BigInteger("a5e1", 16)
    val expected = Secp256k1.address(Secp256k1.mul(priv, Secp256k1.G).get)
    val chainId = BigInteger.valueOf(1)
    val tx0 = TxSender.Tx(
      nonce = BigInteger.valueOf(9), gasPrice = new BigInteger("4a817c800", 16),
      gas = BigInteger.valueOf(21000),
      to = ("3535353535353535353535353535353535353535").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray,
      value = new BigInteger("de0b6b3a7640000", 16), input = Array.empty,
      v = BigInteger.ZERO, r = BigInteger.ZERO, s = BigInteger.ZERO)
    // the EIP-155 spec's own example: this exact tx's signing hash is
    // published in the EIP text — pins RLP + sighash independently
    assert(hex(TxSender.sighash(tx0, Some(chainId))) ==
      "daf5a779ae972f972197303d7b574746c7ef83eadac0f2791ad23db92e4c8e53")
    val (r, s, recId) = Secp256k1.sign(
      TxSender.sighash(tx0, Some(chainId)), priv, new BigInteger("1337", 16))
    val signed = tx0.copy(
      v = chainId.multiply(BigInteger.TWO).add(BigInteger.valueOf(35 + recId)),
      r = r, s = s)
    assert(TxSender.sender(signed) == expected)
    // pre-EIP-155 (v = 27/28) hashes without the chainId triple
    val (r2, s2, rec2) = Secp256k1.sign(
      TxSender.sighash(tx0, None), priv, new BigInteger("1338", 16))
    val legacy = tx0.copy(v = BigInteger.valueOf(27L + rec2), r = r2, s = s2)
    assert(TxSender.sender(legacy) == expected)
    // garbage v → null, not an exception (best-effort like the reference)
    assert(TxSender.sender(tx0.copy(v = BigInteger.valueOf(3))) == null)
    assert(TxSender.sender(signed.copy(r = BigInteger.ZERO)) == null)
  }

  test("EIP-155 sighash differs from pre-155 (replay protection)") {
    val tx = TxSender.Tx(BigInteger.ONE, BigInteger.TEN, BigInteger.TEN,
      Array.empty, BigInteger.ZERO, Array.empty,
      BigInteger.ZERO, BigInteger.ZERO, BigInteger.ZERO)
    assert(!java.util.Arrays.equals(
      TxSender.sighash(tx, Some(BigInteger.ONE)), TxSender.sighash(tx, None)))
  }
}
