package graft.multimodal

/** Test-side access to the package-private codecs. */
object MultimodalTestAccess {
  def avi(w: Int, h: Int, frames: Array[Array[Byte]], usPerFrame: Int): Array[Byte] =
    Multimodal.aviBytes(w, h, frames, usPerFrame)
  def decodeVideo(payload: Array[Byte]): Option[(Int, Int, Long, Long, Long, Long, Long)] =
    Multimodal.decodeVideo(payload)
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Long, Long, Long)] =
    Multimodal.decodeImage(payload)
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
    Multimodal.decodeAudio(payload)
  def jpeg(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] =
    Multimodal.jpegBytes(w, h, r, g, b)
  def aviMjpeg(w: Int, h: Int, jpegFrames: Array[Array[Byte]], usPerFrame: Int): Array[Byte] =
    Multimodal.aviMjpegBytes(w, h, jpegFrames, usPerFrame)
}
