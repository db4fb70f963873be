package graft.queries

import graft.SparkSpec

/** m6's stub PCM kernel pinned on hand-derived bytes (the oracle proves
  * cross-engine agreement; this proves the kernel itself). Byte choices
  * solve the affine sample map s(b) = ((b·31+7) mod 256) − 128:
  *  - b = 41  → s = 126 (|s| ≥ 120: clipped, and the loudest reachable
  *    band), energy 126² per sample;
  *  - b = 103 → s = 0 (|s| ≤ 3: silent, zero energy). */
class AudioKernelSpec extends SparkSpec {

  test("kernel metrics on a hand-computed blob: 64 loud + 10 silent bytes") {
    val bytes = (Array.fill(64)(41) ++ Array.fill(10)(103)).map(_.toByte)
    val out = Multimodal.audioStatsPartition(
      Iterator.single(Multimodal.Blob(7L, "audio", bytes))).toSeq
    assert(out.size == 1)
    val a = out.head
    assert(a.doc_id == 7L)
    assert(a.n_samples == 74L)
    assert(a.silent == 10L, s"silent=${a.silent}")
    assert(a.clipped == 64L, s"clipped=${a.clipped}")
    assert(a.peak == 126L, s"peak=${a.peak}")
    assert(a.energy == 64L * 126 * 126, s"energy=${a.energy}")
    // exactly one FULL frame (bytes 0..63, all loud: 64·126² > 64·5500);
    // the 10-byte tail is a partial frame and must not count
    assert(a.active_frames == 1L, s"active_frames=${a.active_frames}")
  }

  test("an all-silent full frame is inactive; frames close on exact 64-sample boundaries") {
    val bytes = (Array.fill(64)(103) ++ Array.fill(64)(41)).map(_.toByte)
    val a = Multimodal.audioStatsPartition(
      Iterator.single(Multimodal.Blob(1L, "audio", bytes))).toSeq.head
    assert(a.n_samples == 128L && a.silent == 64L && a.clipped == 64L)
    // frame 0 (silent): energy 0 → inactive; frame 1 (loud) → active
    assert(a.active_frames == 1L, s"active_frames=${a.active_frames}")
  }
}
