package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.expr.{Hash64, NamespacedUuid}

/** Property-based invariants, pure-function half (SURVEY §5): UUIDv5
  * determinism + RFC format under arbitrary inputs. Runs on ScalaCheck's
  * own sbt framework (no scalatest bridge needed). */
object UuidProperties extends Properties("NamespacedUuid") {

  private val ns = NamespacedUuid.hexToBytes(NamespacedUuid.NsUser)

  property("uuid5 deterministic + canonical") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val a = NamespacedUuid.compute(ns, UTF8String.fromString(s), 5).toString
      val b = NamespacedUuid.compute(ns, UTF8String.fromString(s), 5).toString
      a == b &&
        a.matches("[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}")
    }

  property("uuid3 version/variant bits") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val u = NamespacedUuid.compute(ns, UTF8String.fromString(s), 3).toString
      u(14) == '3' && "89ab".contains(u(19))
    }

  property("hash64 stable and seed-sensitive") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bytes =>
        val arr = bytes.toArray
        Hash64.hashBytes(arr, 7L) == Hash64.hashBytes(arr, 7L) &&
          Hash64.hashBytes(arr, 7L) != Hash64.hashBytes(arr, 8L)
    }

  property("no collisions over structured key space (5k sample)") = {
    val keys = (1 to 5000).map(i => s"user-$i")
    val uuids = keys.map(k =>
      NamespacedUuid.compute(ns, UTF8String.fromString(k), 5).toString)
    Prop(uuids.distinct.size == keys.size)
  }
}
