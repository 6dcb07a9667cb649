package graft.evm

import java.math.BigInteger

/** secp256k1 ECDSA public-key recovery (pure Scala, from the public
  * SEC 2 / SEC 1 specs) — enough to recover an Ethereum transaction's
  * sender address from its signature, the reference's tx_from
  * enrichment (`internal/parser/parser.go:152-159`, J2).
  *
  * Affine BigInteger arithmetic: correct and compact. The enrichment
  * join form (distinct tx → recover once → broadcast) keeps the per-row
  * cost off the hot path, so constant-time/Jacobian optimizations are
  * not needed here.
  */
object Secp256k1 {

  val P = new BigInteger(
    "fffffffffffffffffffffffffffffffffffffffffffffffffffffffefffffc2f", 16)
  val N = new BigInteger(
    "fffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364141", 16)
  private val B = BigInteger.valueOf(7)
  val Gx = new BigInteger(
    "79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798", 16)
  val Gy = new BigInteger(
    "483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8", 16)

  /** Affine point; None = point at infinity. */
  type Point = Option[(BigInteger, BigInteger)]
  val G: Point = Some((Gx, Gy))

  private def mod(x: BigInteger): BigInteger = {
    val m = x.mod(P); m
  }

  def add(p: Point, q: Point): Point = (p, q) match {
    case (None, _) => q
    case (_, None) => p
    case (Some((x1, y1)), Some((x2, y2))) =>
      if (x1 == x2 && mod(y1.add(y2)).signum() == 0) None
      else {
        val l =
          if (x1 == x2 && y1 == y2)
            mod(x1.pow(2).multiply(BigInteger.valueOf(3))
              .multiply(y1.shiftLeft(1).modInverse(P)))
          else
            mod(y2.subtract(y1).multiply(x2.subtract(x1).modInverse(P)))
        val x3 = mod(l.pow(2).subtract(x1).subtract(x2))
        val y3 = mod(l.multiply(x1.subtract(x3)).subtract(y1))
        Some((x3, y3))
      }
  }

  def mul(k: BigInteger, p: Point): Point = {
    var r: Point = None
    var q = p
    var kk = k.mod(N)
    while (kk.signum() > 0) {
      if (kk.testBit(0)) r = add(r, q)
      q = add(q, q)
      kk = kk.shiftRight(1)
    }
    r
  }

  /** Lift an x coordinate to a curve point with the requested y parity. */
  def liftX(x: BigInteger, odd: Boolean): Option[(BigInteger, BigInteger)] = {
    if (x.compareTo(P) >= 0) return None
    val alpha = mod(x.pow(3).add(B))
    // p ≡ 3 (mod 4) → sqrt = alpha^((p+1)/4)
    val beta = alpha.modPow(P.add(BigInteger.ONE).shiftRight(2), P)
    if (mod(beta.pow(2)) != alpha) return None
    val y = if (beta.testBit(0) == odd) beta else P.subtract(beta)
    Some((x, y))
  }

  /** SEC 1 §4.1.6 public-key recovery. recId ∈ 0..3 (Ethereum v−27). */
  def recoverPublicKey(msgHash: Array[Byte], r: BigInteger, s: BigInteger,
                       recId: Int): Option[(BigInteger, BigInteger)] = {
    if (r.signum() <= 0 || r.compareTo(N) >= 0) return None
    if (s.signum() <= 0 || s.compareTo(N) >= 0) return None
    val x = if (recId >= 2) r.add(N) else r
    liftX(x, odd = (recId & 1) == 1).flatMap { rPoint =>
      val e = new BigInteger(1, msgHash)
      val rInv = r.modInverse(N)
      // Q = r^-1 (s·R − e·G)
      val q = mul(rInv,
        add(mul(s, Some(rPoint)), mul(N.subtract(e.mod(N)), G)))
      q
    }
  }

  /** Ethereum address of an (x, y) public key: last 20 bytes of
    * keccak256(x ‖ y). */
  def address(pub: (BigInteger, BigInteger)): String = {
    def pad32(b: BigInteger): Array[Byte] = {
      val raw = b.toByteArray.dropWhile(_ == 0)
      val out = new Array[Byte](32)
      System.arraycopy(raw, 0, out, 32 - raw.length, raw.length)
      out
    }
    val h = Keccak.hash256(pad32(pub._1) ++ pad32(pub._2))
    "0x" + Keccak.hex(java.util.Arrays.copyOfRange(h, 12, 32))
  }

  /** Recover the signer's Ethereum address, null on failure — best-
    * effort like the reference's tx_from. */
  def recoverAddress(msgHash: Array[Byte], r: BigInteger, s: BigInteger,
                     recId: Int): String =
    recoverPublicKey(msgHash, r, s, recId).map(address).orNull

  /** Minimal ECDSA sign (deterministic k for tests only). Returns
    * (r, s, recId). */
  def sign(msgHash: Array[Byte], priv: BigInteger, k: BigInteger)
      : (BigInteger, BigInteger, Int) = {
    val rp = mul(k, G).get
    val r = rp._1.mod(N)
    require(r.signum() != 0, "bad k")
    val e = new BigInteger(1, msgHash)
    val s = k.modInverse(N).multiply(e.add(r.multiply(priv))).mod(N)
    require(s.signum() != 0, "bad k")
    val recId = (if (rp._2.testBit(0)) 1 else 0) |
      (if (rp._1.compareTo(N) >= 0) 2 else 0)
    (r, s, recId)
  }
}
