package graft

import graft.evm.{Keccak, Secp256k1}
import org.scalatest.funsuite.AnyFunSuite
import java.math.BigInteger

class Secp256k1Spec extends AnyFunSuite {

  test("known vector: private key 1 → canonical Ethereum address") {
    val pub = Secp256k1.mul(BigInteger.ONE, Secp256k1.G).get
    assert(pub._1 == Secp256k1.Gx && pub._2 == Secp256k1.Gy)
    assert(Secp256k1.address(pub) ==
      "0x7e5f4552091a69125d5dfcb7b8c2659029395bdf")
  }

  test("curve law: 2G + G == 3G, n·G == infinity") {
    val g2 = Secp256k1.add(Secp256k1.G, Secp256k1.G)
    val g3a = Secp256k1.add(g2, Secp256k1.G)
    val g3b = Secp256k1.mul(BigInteger.valueOf(3), Secp256k1.G)
    assert(g3a == g3b)
    assert(Secp256k1.mul(Secp256k1.N, Secp256k1.G).isEmpty)
  }

  test("sign → recover roundtrip returns the signer's address") {
    val priv = new BigInteger(
      "4c0883a69102937d6231471b5dbb6204fe512961708279f2e3e8a5d4b8e3e9c1", 16)
    val expected = Secp256k1.address(Secp256k1.mul(priv, Secp256k1.G).get)
    val msg = Keccak.hash256("graft tx payload".getBytes("UTF-8"))
    val k = new BigInteger(
      "7a1a7e52797fc8caaa435d2a4dace39158504bf204fbe19f14dbb427faee50ae", 16)
    val (r, s, recId) = Secp256k1.sign(msg, priv, k)
    assert(Secp256k1.recoverAddress(msg, r, s, recId) == expected)
    // the other parity must NOT recover to the same address
    val other = Secp256k1.recoverAddress(msg, r, s, recId ^ 1)
    assert(other != null && other != expected)
  }

  test("invalid signatures recover to null, not failure (best-effort J2)") {
    val msg = Keccak.hash256("x".getBytes("UTF-8"))
    assert(Secp256k1.recoverAddress(msg, BigInteger.ZERO, BigInteger.ONE, 0) == null)
    assert(Secp256k1.recoverAddress(msg, Secp256k1.N, BigInteger.ONE, 0) == null)
  }
}
