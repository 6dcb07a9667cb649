package graft.evm

import java.math.BigInteger

/** Minimal RLP encoder (public Ethereum RLP spec) — enough to compute
  * a legacy transaction's signing hash, which is what the reference's
  * `types.Sender(signer, tx)` does inside go-ethereum for the tx_from
  * enrichment (`internal/parser/parser.go:152-159`). Encode-only:
  * decoding is not needed to recover senders. */
object Rlp {

  sealed trait Item
  final case class Str(bytes: Array[Byte]) extends Item
  final case class Lst(items: Seq[Item]) extends Item

  /** Big-endian minimal-byte integer item (0 → empty string). */
  def int(v: BigInteger): Item = {
    require(v.signum() >= 0, "rlp: negative integer")
    if (v.signum() == 0) Str(Array.empty)
    else Str(v.toByteArray.dropWhile(_ == 0))
  }
  def int(v: Long): Item = int(BigInteger.valueOf(v))

  def encode(item: Item): Array[Byte] = item match {
    case Str(b) =>
      if (b.length == 1 && (b(0) & 0xff) < 0x80) b
      else lengthPrefix(b.length, 0x80) ++ b
    case Lst(items) =>
      val payload = items.flatMap(encode).toArray
      lengthPrefix(payload.length, 0xc0) ++ payload
  }

  private def lengthPrefix(len: Int, base: Int): Array[Byte] =
    if (len <= 55) Array((base + len).toByte)
    else {
      val lenBytes = BigInteger.valueOf(len.toLong).toByteArray.dropWhile(_ == 0)
      Array((base + 55 + lenBytes.length).toByte) ++ lenBytes
    }
}

/** Legacy (pre-typed) Ethereum transaction sender recovery: RLP sighash
  * + secp256k1 public-key recovery — the `types.LatestSignerForChainID`
  * / `types.Sender` pair the reference leans on go-ethereum for.
  * Typed (EIP-2718) transactions are out of scope: the shipped
  * pipelines only need the address, and the stub fixtures are legacy. */
object TxSender {

  /** One fetched transaction's signature-relevant fields
    * (`eth_getTransactionByHash` result). `to` empty = contract
    * creation. */
  final case class Tx(nonce: BigInteger, gasPrice: BigInteger,
                      gas: BigInteger, to: Array[Byte], value: BigInteger,
                      input: Array[Byte], v: BigInteger, r: BigInteger,
                      s: BigInteger)

  /** EIP-155 signing hash: keccak(rlp([nonce, gasPrice, gas, to,
    * value, data, chainId, 0, 0])); pre-155 (v = 27/28) omits the
    * trailing triple. */
  def sighash(tx: Tx, chainId: Option[BigInteger]): Array[Byte] = {
    import Rlp._
    val core = Seq(int(tx.nonce), int(tx.gasPrice), int(tx.gas),
      Str(tx.to), int(tx.value), Str(tx.input))
    val items = chainId match {
      case Some(id) => core ++ Seq(int(id), int(0L), int(0L))
      case None => core
    }
    Keccak.hash256(encode(Lst(items)))
  }

  /** Recovered sender address ("0x…") or null — best-effort like the
    * reference (parser.go:155-158). chainId and recId derive from v:
    * v ∈ {27, 28} is pre-155, v ≥ 35 is EIP-155 (v = chainId·2 + 35 +
    * recId). */
  def sender(tx: Tx): String = {
    val v = tx.v
    val (chainId, recId) =
      if (v == BigInteger.valueOf(27) || v == BigInteger.valueOf(28))
        (None, v.intValueExact() - 27)
      else if (v.compareTo(BigInteger.valueOf(35)) >= 0) {
        val rec = v.subtract(BigInteger.valueOf(35)).testBit(0)
        (Some(v.subtract(BigInteger.valueOf(35)).shiftRight(1)),
          if (rec) 1 else 0)
      } else return null
    try Secp256k1.recoverAddress(sighash(tx, chainId), tx.r, tx.s, recId)
    catch { case _: Exception => null }
  }
}
