package graft.queries

/** Product-quantization geometry shared by q79 (encode) and q82/q85
  * (IVF-PQ ADC search): 64-dim vectors split into 16 subspaces of 4 dims,
  * each encoded as the argmin of 4 deterministic codebook centroids.
  *
  * The codebook entries are Hadamard-style sign patterns scaled to
  * +-1/16 — dyadic rationals, so they are exactly representable doubles
  * and squared distances are bit-identical on both engines (the q39
  * exactness pattern). The +-1/16 scale puts every centroid at norm
  * sqrt(4)/16 = 1/8, inside the data space of unit-norm embeddings whose
  * 4-dim subvectors have norm ~1/4: the round-6 integer-valued stand-ins
  * (magnitude ~4, norm ~8 per subspace) sat so far outside data space
  * that every subvector quantized to the same code and ADC ranking
  * degenerated to vec_id order (measured recall@3 = 0/30); with this
  * geometry the 16x4 codes measure 0.53-0.63 recall@3 against the exact
  * cosine top-5 across sf0.001/0.01/0.1 (TechniqueSpec asserts the 1/3
  * floor). 16 subspaces x 2 bits also beats the old 4x2-bit layout's
  * resolution at the same join shape — codes are still a handful of
  * small ints per vector.
  */
private[queries] object PqGeometry {
  val PqSub = 16   // subspaces
  val PqSubDim = 4 // dims per subspace (16 x 4 = 64 = embedding dim)
  val PqK = 4      // centroids per subspace

  /** Deterministic sign-pattern PQ codebook entry (m = subspace,
    * k = centroid, i = component): (-1)^popcount((i + 4m) & (5k+3)) / 16.
    * The shifting AND mask varies the sign pattern across (m, k) so the
    * 4 centroids of each subspace point in distinct directions. */
  def pqCentroid(m: Int, k: Int): Seq[Double] =
    (0 until PqSubDim).map { i =>
      val sign = if (Integer.bitCount((i + PqSubDim * m) & (5 * k + 3)) % 2 == 0) 1.0 else -1.0
      sign / 16.0
    }
}
