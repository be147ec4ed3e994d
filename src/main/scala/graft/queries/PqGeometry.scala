package graft.queries

/** Product-quantization geometry shared by q79 (encode) and q82 (IVF-PQ
  * ADC search): 64-dim vectors split into 4 subspaces of 16 dims, each
  * encoded as the argmin of 4 deterministic codebook centroids.
  *
  * The codebook entries are integer-valued stand-ins for per-subspace
  * k-means output, so squared distances are integer-exact in double on
  * both engines (the q39 exactness pattern).
  */
private[queries] object PqGeometry {
  val PqSub = 4     // subspaces
  val PqSubDim = 16 // dims per subspace (4 x 16 = 64 = embedding dim)
  val PqK = 4       // centroids per subspace

  /** Deterministic integer-valued PQ codebook entry (m = subspace,
    * k = centroid, i = component). */
  def pqCentroid(m: Int, k: Int): Seq[Double] =
    (0 until PqSubDim).map(i => (((i * 7 + k * 13 + m * 5) % 9) - 4).toDouble)
}
