package graft.multimodal

/** Test-side access to the package-private AVI muxer. */
object MultimodalTestAccess {
  def avi(w: Int, h: Int, frames: Array[Array[Byte]], usPerFrame: Int): Array[Byte] =
    Multimodal.aviBytes(w, h, frames, usPerFrame)
}
