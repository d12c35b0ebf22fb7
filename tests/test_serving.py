"""Serving stack tests: sinks, ASR windowing state machine, audio FE."""

import numpy as np
import pytest

from lzzx_nerf_tpu.serving.asr import FeatureRing, StreamingASR, SAMPLE_RATE
from lzzx_nerf_tpu.serving.streaming import NullSink, RawFileSink, make_sink
from lzzx_nerf_tpu.audio import melspectrogram, wav_to_mel_chunks


def test_raw_sink_roundtrip(tmp_path):
    p = str(tmp_path / "out.raw")
    sink = RawFileSink(p)
    frame = np.arange(48, dtype=np.uint8).tobytes()
    for _ in range(3):
        sink.push(frame)
    sink.close()
    data = open(p, "rb").read()
    assert data == frame * 3
    assert sink.count == 3


def test_make_sink_fallbacks(tmp_path):
    assert isinstance(make_sink("null", 4, 4), NullSink)
    assert isinstance(make_sink("raw", 4, 4, path=str(tmp_path / "x.raw")),
                      RawFileSink)


def test_feature_ring_windows():
    C = 29
    ring = FeatureRing(audio_dim=C, context_size=50)
    # push two blocks of recognisable values
    block = np.arange(50, dtype=np.float32)[:, None].repeat(C, 1)
    ring.push_block(block)
    ring.push_block(block + 100)
    w = ring.next_att_window()
    assert w.shape == (8, 16, C)
    # first windows include the fake zero left-padding, then real data
    w2 = ring.next_att_window()
    assert np.any(w2 != w)


def test_streaming_asr_with_fake_ctc():
    """Full streaming loop with a deterministic feature_fn: chunk index must
    flow through stride trimming into the ring in order."""
    C = 29
    calls = []

    def fake_fn(samples):
        # one logit row per 20ms chunk; value = mean sample value of the chunk
        T = len(samples) // 320
        rows = samples[: T * 320].reshape(T, 320).mean(-1)
        calls.append(T)
        return np.repeat(rows[:, None], C, axis=1).astype(np.float32)

    asr = StreamingASR(audio_dim=C, feature_fn=fake_fn)
    # stream 2 seconds of chunks whose value == their index
    windows = list(asr.run_stream(
        (np.full(320, i, np.float32) for i in range(100))))
    assert len(windows) > 0
    assert windows[0].shape == (8, 16, C)
    # trimming: each step consumed left+mid+right chunks but kept mid rows
    assert all(t == 70 for t in calls[:1])
    # values in later windows increase monotonically-ish (stream order kept)
    v_first = float(windows[0][-1].mean())
    v_last = float(windows[-1][-1].mean())
    assert v_last > v_first


def test_streaming_asr_save_feats_unfold():
    C = 8

    def fake_fn(samples):
        T = len(samples) // 320
        return np.zeros((T, C), np.float32)

    asr = StreamingASR(audio_dim=C, feature_fn=fake_fn, save_feats=True)
    for i in range(140):
        asr.step(np.zeros(320, np.float32))
    asr.step(None)
    out = asr.unfolded_features()
    assert out.ndim == 3 and out.shape[1:] == (16, C)


def test_mel_chunks_at_25fps():
    t = np.arange(2 * SAMPLE_RATE) / SAMPLE_RATE
    wav = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    chunks = wav_to_mel_chunks(wav, SAMPLE_RATE)
    assert abs(len(chunks) - 51) <= 2          # ~2s * 25fps
    assert chunks[0].shape == (80, 8)
    mel = melspectrogram(wav)
    assert mel.shape[0] == 80
    assert mel.min() >= -4.0 and mel.max() <= 4.0
