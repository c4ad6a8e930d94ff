package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Structural laws for the Hilbert curve kernel — properties no
  * subtly-wrong variant (flipped rotation, missed reflection, wrong
  * quadrant order) can satisfy:
  *
  *  1. bijectivity: over the full 2^bits × 2^bits grid the index is a
  *     bijection onto [0, 4^bits) — proven by exhaustive enumeration at
  *     small orders plus inverse round-trips at order 16;
  *  2. UNIT-STEP ADJACENCY: consecutive indices are Manhattan-adjacent
  *     cells. This is the curve's defining property (and what z-order
  *     lacks: the Morton curve jumps at every power-of-two boundary) —
  *     it is why a Hilbert-range file covers one contiguous region;
  *  3. masking: out-of-grid inputs fold in (no corruption from wide or
  *     negative values);
  *  4. nesting: the first quadrant of the order-(b+1) curve is the
  *     order-b curve (prefix stability under refinement).
  */
object HilbertLaws extends Properties("HilbertLaws") {

  property("bijection onto [0, 4^bits) at orders 1..4, exhaustively") =
    Prop.forAll(Gen.choose(1, 4)) { bits =>
      val n = 1L << bits
      val ds = for (x <- 0L until n; y <- 0L until n)
        yield Hilbert.xy2d(bits, x, y)
      ds.toSet == (0L until n * n).toSet
    }

  property("d2xy inverts xy2d at order 16") =
    Prop.forAll(Gen.choose(0L, (1L << 16) - 1), Gen.choose(0L, (1L << 16) - 1)) {
      (x, y) =>
        Hilbert.d2xy(16, Hilbert.xy2d(16, x, y)) == ((x, y))
    }

  property("consecutive indices are Manhattan-adjacent cells") =
    Prop.forAll(Gen.choose(1, 6), Gen.choose(0L, (1L << 12) - 2)) {
      (bits, seed) =>
        val last = (1L << (2 * bits)) - 1
        val d = seed % last // d and d+1 both on the curve
        val (x1, y1) = Hilbert.d2xy(bits, d)
        val (x2, y2) = Hilbert.d2xy(bits, d + 1)
        math.abs(x1 - x2) + math.abs(y1 - y2) == 1
    }

  property("inputs fold into the grid by masking") =
    Prop.forAll(Gen.choose(1, 8), Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(Long.MinValue, Long.MaxValue)) { (bits, x, y) =>
      val m = (1L << bits) - 1
      Hilbert.xy2d(bits, x, y) == Hilbert.xy2d(bits, x & m, y & m)
    }

  property("order-b curve is the first quadrant of order-(b+1)") =
    Prop.forAll(Gen.choose(1, 10), Gen.choose(0L, (1L << 10) - 1),
      Gen.choose(0L, (1L << 10) - 1)) { (bits, x0, y0) =>
      val m = (1L << bits) - 1
      val (x, y) = (x0 & m, y0 & m)
      // the low quadrant of the refined curve starts at index 0 and is
      // the TRANSPOSED order-b curve: the level-0 step has rx=ry=0, so
      // it contributes no index and applies the axis swap — a strict
      // equality, not an up-to-orientation one
      Hilbert.xy2d(bits + 1, x, y) == Hilbert.xy2d(bits, y, x)
    }
}
