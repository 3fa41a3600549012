package graft.multimodal

/** Multimodal column support: opaque `binary` payloads with typed
  * metadata, plus decode / feature-extraction stages.
  *
  * The image/audio codec libraries are NOT present in this environment,
  * so the decode step is a '''clearly-marked deterministic stub'''
  * ([[MediaCodecs]]): it produces a fake "decoded" feature tensor from
  * the raw bytes with a fixed shape. Everything AROUND the stub — the
  * binary column schema, the typed Dataset plumbing, the per-partition
  * batched iteration (the JVM analogue of `mapInPandas` batch shape),
  * partitioning, and the metadata struct — is real and tested, so
  * swapping in a real codec is a one-function change.
  */
object MediaCodecs {

  /** Fixed feature dimensionality of the stub "decoder". */
  val FeatureDim = 16

  /** STUB — stands in for a real image/audio decode + embed step
    * (e.g. JPEG decode → CNN features). Deterministic fake: a 16-bin
    * byte-value histogram normalized by payload length. Real codecs
    * drop in here without touching any caller.
    */
  def decodeFeaturesStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Int](FeatureDim)
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) * FeatureDim / 256) += 1
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    bins.map(_ / n)
  }

  /** STUB — stands in for frame decode in a video payload: slices the
    * byte stream into fixed-size pseudo-frames. Real demuxers replace
    * this; the sampling/explode plumbing around it stays.
    */
  val FrameBytes = 32

  /** Row stride when an image payload is viewed as a byte grid. */
  val ImageRowBytes = 32

  /** Thumbnail edge length produced by [[resizeStub]]. */
  val ThumbEdge = 8

  /** STUB — stands in for an image resample (a real codec does
    * bilinear/Lanczos over decoded pixels): nearest-neighbor gather
    * over the payload viewed as a [[ImageRowBytes]]-column byte grid
    * (partial last row discarded). Deterministic, so the oracle can
    * recompute every output byte; callers' schema/partitioning/digest
    * plumbing is untouched by swapping in a real resampler.
    */
  /** Window width (bytes ≙ stub samples) for [[audioWindowsStub]]. */
  val AudioWinBytes = 64

  /** STUB — PCM decode stand-in: payload bytes as unsigned 8-bit
    * samples, sliced into full [[AudioWinBytes]] windows (partial
    * tail dropped), each reduced to (energy = Σ sample², peak = max
    * sample) — the envelope a silence/clipping detector reads. A real
    * audio decoder replaces the byte view; the windowing/flatMap
    * plumbing and exact-int64 reductions stay.
    */
  def audioWindowsStub(payload: Array[Byte]): Array[(Long, Long)] = {
    val nWin = payload.length / AudioWinBytes
    val out = new Array[(Long, Long)](nWin)
    var w = 0
    while (w < nWin) {
      var energy = 0L
      var peak = 0L
      var j = 0
      while (j < AudioWinBytes) {
        val v = (payload(w * AudioWinBytes + j) & 0xff).toLong
        energy += v * v
        if (v > peak) peak = v
        j += 1
      }
      out(w) = (energy, peak)
      w += 1
    }
    out
  }

  /** Average-hash ("aHash") perceptual signature over the
    * [[resizeStub]] thumbnail: bit i is set iff thumbnail byte i
    * (unsigned) exceeds the thumbnail mean — compared as
    * `len·bᵢ > Σb`, exact integer arithmetic, so the oracle recomputes
    * every bit from the string side. 64 bits for the 8×8 thumbnail
    * (bit 63 relies on Long's two's-complement wrap, which DuckDB's
    * int128 SUM + BIGINT cast reproduces). A real perceptual hash
    * (DCT pHash) drops in here; the banding/join plumbing around it
    * stays.
    */
  def aHashStub(payload: Array[Byte]): Long = {
    val t = resizeStub(payload, ThumbEdge, ThumbEdge)
    var sum = 0L
    var i = 0
    while (i < t.length) { sum += (t(i) & 0xff); i += 1 }
    var h = 0L
    i = 0
    while (i < t.length) {
      if (t.length.toLong * (t(i) & 0xff) > sum) h |= (1L << i)
      i += 1
    }
    h
  }

  def resizeStub(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val srcW = ImageRowBytes
    val h = payload.length / srcW
    val out = new Array[Byte](outW * outH)
    var r = 0
    while (r < outH) {
      var c = 0
      while (c < outW) {
        out(r * outW + c) = payload((r * h / outH) * srcW + (c * srcW / outW))
        c += 1
      }
      r += 1
    }
    out
  }
}

/** One media row: the payload is an opaque binary column; `meta` is
  * the typed metadata that rides alongside it (the pattern for 100 TB
  * multimodal tables: never decode in the storage layer, push the
  * payload bytes through untouched, keep metadata queryable columns).
  */
case class MediaRow(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte],
    n_bytes: Long)

case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    features: Array[Float])

case class MediaThumb(
    doc_id: Long,
    src_h: Long,
    resized: Array[Byte])

case class MediaAudioWin(
    doc_id: Long,
    win_idx: Long,
    energy: Long,
    peak: Long)
