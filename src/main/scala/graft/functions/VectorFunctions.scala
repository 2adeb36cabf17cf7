package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance / similarity kernels as native Column expressions.
  *
  * Semantics follow the reference (SURVEY §2.4, hnswlib spaces used by
  * `/root/reference/src/mlvectordb/implementations/index.py:18,125-127`):
  *
  *  - `l2sq` — the reference's "l2" space is **squared** Euclidean (hnswlib
  *    returns squared L2; do NOT sqrt).
  *  - `cosineSim` — hnswlib's "cosine" distance is `1 − cos(a,b)`; the
  *    reference query processor flips it back to a similarity score
  *    (`index.py:125-127`), so our canonical score is cosine *similarity*,
  *    descending.
  *  - `ipDist` — hnswlib "ip" space distance `1 − ⟨a,b⟩`, ascending.
  *
  * Elements are float32 at rest (`implementations/vector.py:14`); every
  * kernel casts to double *before* arithmetic and accumulates in double so
  * scores are deterministic and hash-stable against a float64 oracle.
  *
  * All kernels are pure Catalyst built-ins (`zip_with` + `aggregate`), so
  * they stay inside whole-stage codegen and need no UDF/serialization — the
  * idiomatic Spark translation of the reference's numpy kernels.
  */
object VectorFunctions {

  // Primary kernels: the codegen VectorDistance Expression — one fused
  // loop over the ArrayData buffers, ~59× faster than the composed form
  // on the sf0.1 all-pairs workload (KernelBench) and bit-identical.

  /** ⟨a,b⟩ accumulated in double. */
  def dot(a: Column, b: Column): Column = VectorDistance.dot(a, b)

  /** Squared Euclidean distance Σ(aᵢ−bᵢ)² — the reference "l2" space. */
  def l2sq(a: Column, b: Column): Column = VectorDistance.l2sq(a, b)

  /** Euclidean norm ‖a‖. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity ∈ [−1,1], descending = most similar first. */
  def cosineSim(a: Column, b: Column): Column = VectorDistance.cosineSim(a, b)

  /** Inner-product distance 1 − ⟨a,b⟩ (hnswlib "ip" space), ascending. */
  def ipDist(a: Column, b: Column): Column = lit(1.0) - dot(a, b)

  // Composed (`zip_with`+`aggregate`) reference forms — kept as the
  // pure-built-in specification the codegen kernels are checked against
  // (KernelBench / DistanceSpec assert bit-identity).

  def dotComposed(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2sqComposed(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => { val d = x.cast("double") - y.cast("double"); d * d }),
      lit(0.0),
      (acc, v) => acc + v)

  def cosineSimComposed(a: Column, b: Column): Column =
    dotComposed(a, b) / (sqrt(dotComposed(a, a)) * sqrt(dotComposed(b, b)))
}
