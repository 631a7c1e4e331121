package graft

/** Outcome of a fixed-point kernel run ([[operators.Hits.runConverged]],
  * [[operators.Salsa.runConverged]],
  * [[operators.PageRank.runConverged]]): the final vector(s), the
  * iteration count actually executed, and an EXPLICIT convergence
  * verdict — `converged = true` iff a scheduled delta check observed
  * max|Δscore| < tol before the loop exhausted `maxIter`.
  *
  * `converged = false` means the loop was CAPPED: the vectors are the
  * best available refinement, not a certified fixed point. Callers
  * must not have to infer that from `iterations == maxIter` — that
  * test is ambiguous when the true fixed point lands exactly on the
  * cap iteration (the check there can still certify convergence), so
  * the flag is carried explicitly and the `*_converged` gates assert
  * it as a marker row alongside `n_iter`.
  */
case class Fixpoint[A](result: A, iterations: Int, converged: Boolean)
