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


def test_asr_feature_rows_incremental_equals_offline():
    """feature_rows (the live adapter cli.run_asr_live feeds run_live with)
    must emit exactly the offline unfold: concatenating its incremental
    yields equals unfolded_features() row-for-row, for a chunk-value
    feature_fn that makes any lattice slip visible."""
    C = 8

    def fake_fn(samples):
        T = len(samples) // 320
        rows = samples[: T * 320].reshape(T, 320).mean(-1)
        return np.repeat(rows[:, None], C, axis=1).astype(np.float32)

    def chunk_gen():
        return (np.full(320, i, np.float32) for i in range(137))

    offline = StreamingASR(audio_dim=C, feature_fn=fake_fn,
                           save_feats=True)
    for c in chunk_gen():
        offline.step(c)
    offline.step(None)
    want = offline.unfolded_features()

    live = StreamingASR(audio_dim=C, feature_fn=fake_fn, save_feats=True)
    consumed = 0

    def counting_gen():
        nonlocal consumed
        for c in chunk_gen():
            consumed += 1
            yield c

    rows = []
    first_row_at = None
    for r in live.feature_rows(counting_gen()):
        if first_row_at is None:
            first_row_at = consumed
        rows.append(r)
    assert all(r.shape == (1, 16, C) for r in rows)
    got = np.concatenate(rows, axis=0)
    np.testing.assert_array_equal(got, want)
    # incrementality: the first row must arrive mid-stream (right after the
    # ASR warm-up), not in a terminal batch
    assert first_row_at is not None and first_row_at < 100

    import pytest as _pytest

    with _pytest.raises(ValueError, match="save_feats"):
        next(StreamingASR(audio_dim=C, feature_fn=fake_fn)
             .feature_rows(chunk_gen()))


def test_mel_chunks_at_25fps():
    t = np.arange(2 * SAMPLE_RATE) / SAMPLE_RATE
    wav = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    chunks = wav_to_mel_chunks(wav, SAMPLE_RATE)
    assert abs(len(chunks) - 51) <= 2          # ~2s * 25fps
    assert chunks[0].shape == (80, 8)
    mel = melspectrogram(wav)
    assert mel.shape[0] == 80
    assert mel.min() >= -4.0 and mel.max() <= 4.0


def test_mel_chunks_short_wav_keeps_contract_shape():
    """A sub-90 ms wav yields fewer mel frames than mel_step_size; every
    chunk must still be [num_mels, mel_step_size] (right-padded), not a
    ragged tail slice."""
    from lzzx_nerf_tpu.audio.mel import MelParams

    wav = np.random.default_rng(1).standard_normal(800).astype(np.float32)
    chunks = wav_to_mel_chunks(wav, SAMPLE_RATE)
    assert len(chunks) >= 1
    for c in chunks:
        assert c.shape == (80, MelParams().mel_step_size)


def test_overlay_sink_command(tmp_path):
    """The crop-overlay composite must mirror the reference's stream graph
    (ConsumeMQByWebRTC.py:87-133): source video as base, rendered crop
    overlaid at (x, y), audio muxed, rtmp + local mp4 outputs split."""
    from lzzx_nerf_tpu.serving.streaming import FfmpegOverlaySink

    s = FfmpegOverlaySink(512, 512, 25, ready_video="ready.mp4",
                          crop_xy=(120, 80), audio_path="a.wav",
                          rtmp_url="rtmp://h/live/x", local_mp4="out.mp4")
    cmd = s.command()
    fc = cmd[cmd.index("-filter_complex") + 1]
    assert "[1:v][0:v]overlay=120:80" in fc     # source base, render on top
    # the base input is -stream_loop -1 and never EOFs: the composite must
    # end with the crop stream, or close() stalls and kills ffmpeg mid-write
    assert ":shortest=1" in fc
    assert "split=2" in fc
    assert "rtmp://h/live/x" in cmd and "out.mp4" in cmd
    assert cmd.count("-map") == 4               # 2 video outs + 2 audio maps
    assert "a.wav" in cmd

    single = FfmpegOverlaySink(512, 512, 25, ready_video="r.mp4",
                               crop_xy=(0, 0), local_mp4="only.mp4")
    fc = single.command()[single.command().index("-filter_complex") + 1]
    assert "split" not in fc and "overlay=0:0" in fc

    # the stdin format must match what the session renders (sink.pix_fmt) —
    # a hardcoded rgb24 against the yuv420p default scrambled the stream
    cmd = s.command()
    assert cmd[cmd.index("-pix_fmt") + 1] == s.pix_fmt

    # open() must attach the frame pump attribute push()/close() rely on
    # (regression: FfmpegOverlaySink.open override skipped _attach_pump ->
    # AttributeError on the first pushed frame)
    import unittest.mock as um

    with um.patch("subprocess.Popen") as pop, \
         um.patch("shutil.which", return_value="/usr/bin/ffmpeg"), \
         um.patch.dict("sys.modules",
                       {"lzzx_nerf_tpu.native": None}):  # no real pump thread
        pop.return_value.stdin.fileno.return_value = 1
        s.open()
    assert hasattr(s, "pump") and s.pump is None


def test_make_sink_picks_overlay_when_crop_params_exist(tmp_path):
    import json as js

    from lzzx_nerf_tpu.serving.streaming import (FfmpegMp4Sink,
                                                 FfmpegOverlaySink, make_sink)

    model = tmp_path / "model"
    model.mkdir()
    # without crop assets: plain mp4 sink
    s = make_sink("mp4", 512, 512, path=str(tmp_path / "o.mp4"),
                  model_dir=str(model))
    assert isinstance(s, FfmpegMp4Sink)
    # with crop assets: overlay composite
    js.dump({"x": 7, "y": 9, "w": 512, "h": 512},
            open(model / "video_crop_parameter.json", "w"))
    (model / "readySourceVideo.mp4").write_bytes(b"x")
    s = make_sink("mp4", 512, 512, path=str(tmp_path / "o.mp4"),
                  model_dir=str(model), audio_path="a.wav")
    assert isinstance(s, FfmpegOverlaySink)
    assert s.crop_xy == (7, 9)


def test_crop_tool_commands(tmp_path):
    from lzzx_nerf_tpu.preprocess.crop import crop_commands, run_crop_tool

    cmds = crop_commands("/d/v.mp4", 10, 20, 300, 400, bc="/d/bc.jpg")
    assert "crop=300:400:10:20" in " ".join(cmds["train"])
    assert "overlay=10:20" in " ".join(cmds["ready"])
    assert any(p.endswith("readySourceVideo.mp4") for p in cmds["ready"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        run_crop_tool("/d/v.mp4", 0, 0, 301, 400)  # odd width


def test_webapi_models_route_and_traversal(tmp_path):
    import json as js
    import threading
    import urllib.error
    import urllib.request

    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.webapi import serve

    data = tmp_path / "data"
    (data / "alice").mkdir(parents=True)
    (data / "alice" / "transforms_train.json").write_text("{}")
    (data / "not_a_model").mkdir()

    httpd = serve(Config(), host="127.0.0.1", port=0,
                  data_root=str(data), trial_root=str(tmp_path))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/models") as r:
            got = js.loads(r.read())
        assert got == {"models": ["alice"], "current": None,
                       "status": "success"}

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/model_select",
            js.dumps({"model": "../alice"}).encode(),
            {"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            raise AssertionError("traversal accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/result.mp4") as r:
            raise AssertionError("missing result served")
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        httpd.shutdown()


def test_mic_chunk_stream_gated():
    """Without an audio stack the mic source must raise with instructions,
    not crash obscurely."""
    import pytest as _pytest

    from lzzx_nerf_tpu.serving.asr import mic_chunk_stream

    try:
        import sounddevice  # noqa: F401
        _pytest.skip("sounddevice installed — gating not applicable")
    except ImportError:
        pass
    try:
        import pyaudio  # noqa: F401
        _pytest.skip("pyaudio installed — gating not applicable")
    except ImportError:
        pass
    with _pytest.raises(RuntimeError, match="sounddevice"):
        next(mic_chunk_stream())


def test_hls_sink_command(tmp_path):
    from lzzx_nerf_tpu.serving.streaming import FfmpegHlsSink, make_sink

    s = make_sink("hls", 512, 512, path=str(tmp_path / "hls"))
    assert isinstance(s, FfmpegHlsSink)
    args = s._output_args()
    assert "-f" in args and "hls" in args
    assert any(a.endswith("stream.m3u8") for a in args)
    assert any("seg_%05d.ts" in a for a in args)


def test_hls_fmp4_sink_command(tmp_path):
    """The fMP4 (CMAF) segment mode the bundled browser player consumes:
    one init.mp4 declared via EXT-X-MAP plus .m4s fragments that append
    straight into an MSE SourceBuffer (player.html::playFmp4Hls)."""
    import pytest as _pytest

    from lzzx_nerf_tpu.serving.streaming import FfmpegHlsSink, make_sink

    s = make_sink("hls-fmp4", 512, 512, path=str(tmp_path / "hls"))
    assert isinstance(s, FfmpegHlsSink) and s.segment_type == "fmp4"
    args = s._output_args()
    assert args[args.index("-hls_segment_type") + 1] == "fmp4"
    assert args[args.index("-hls_fmp4_init_filename") + 1] == "init.mp4"
    assert any("seg_%05d.m4s" in a for a in args)
    assert "-map" not in args           # no audio -> no maps
    with _pytest.raises(ValueError, match="mpegts|fmp4"):
        FfmpegHlsSink(str(tmp_path), 512, 512, segment_type="dash")

    # driving-audio mux (reference ConsumeMQByWebRTC.py:87-133): wav in as
    # a second input, AAC track mapped alongside the stdin video
    sa = make_sink("hls-fmp4", 512, 512, path=str(tmp_path / "hls"),
                   audio_path="/tmp/driving.wav")
    args = sa._output_args()
    assert args[args.index("-i") + 1] == "/tmp/driving.wav"
    assert args[args.index("-c:a") + 1] == "aac"
    assert "1:a:0" in args and "0:v:0" in args and "-shortest" in args

    # stale-utterance cleanup removes exactly the packager's artifacts
    out = tmp_path / "hls"
    out.mkdir(exist_ok=True)
    for name in ("stream.m3u8", "seg_00000.m4s", "seg_00000.ts",
                 "init.mp4", "keepme.txt"):
        (out / name).write_text("x")
    s.clean_output_dir()
    assert sorted(p.name for p in out.iterdir()) == ["keepme.txt"]


def test_webapi_hls_route(tmp_path):
    """GET /hls/<name> serves playlist+segments for the bundled player,
    traversal-hardened; /api/status advertises the playlist once written."""
    import json as js
    import threading
    import urllib.error
    import urllib.request

    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.webapi import serve

    hls = tmp_path / "hls_out"
    hls.mkdir()
    httpd = serve(Config(), host="127.0.0.1", port=0,
                  data_root=str(tmp_path), trial_root=str(tmp_path),
                  sink_kind="hls-fmp4", out_path=str(hls))
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        # nothing packaged yet: status has no hls_url, GET 404s
        with urllib.request.urlopen(f"{base}/api/status") as r:
            st = js.loads(r.read())
        assert st["hls_url"] is None and st["hls_type"] is None
        assert st["hls_codecs"] is None
        for bad in ("/hls/stream.m3u8",          # not written yet
                    "/hls/..%2fsecret.m3u8",     # traversal
                    "/hls/notes.txt"):           # extension allowlist
            try:
                urllib.request.urlopen(base + bad)
                raise AssertionError(f"{bad} served")
            except urllib.error.HTTPError as e:
                assert e.code == 404, bad

        (hls / "stream.m3u8").write_text(
            '#EXTM3U\n#EXT-X-MAP:URI="init.mp4"\nseg_00000.m4s\n')
        (hls / "init.mp4").write_bytes(b"\x00init")
        (hls / "seg_00000.m4s").write_bytes(b"\x00seg")
        (tmp_path / "secret.m3u8").write_text("outside")

        with urllib.request.urlopen(f"{base}/api/status") as r:
            st = js.loads(r.read())
        assert st["hls_url"] == "/hls/stream.m3u8"
        assert st["hls_type"] == "fmp4"
        assert st["hls_codecs"] == "avc1.64001f"   # no audio muxed yet
        with urllib.request.urlopen(f"{base}/hls/stream.m3u8") as r:
            assert r.headers["Content-Type"] == \
                "application/vnd.apple.mpegurl"
            assert r.headers["Cache-Control"] == "no-store"
            assert "init.mp4" in r.read().decode()
        with urllib.request.urlopen(f"{base}/hls/seg_00000.m4s") as r:
            assert r.headers["Content-Type"] == "video/mp4"
            assert r.read() == b"\x00seg"
        # traversal via an allowlisted extension still rejected
        try:
            urllib.request.urlopen(base + "/hls/..%2fsecret.m3u8")
            raise AssertionError("traversal served")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # /static/ serves deployment extras next to player.html (the
        # optional hls.min.js slot for mpegts playlists), same hardening
        with urllib.request.urlopen(f"{base}/static/player.html") as r:
            assert r.headers["Content-Type"] == "text/html"
        for bad in ("/static/hls.min.js",          # not deployed here
                    "/static/..%2f..%2fwebapi.py"):
            try:
                urllib.request.urlopen(base + bad)
                raise AssertionError(f"{bad} served")
            except urllib.error.HTTPError as e:
                assert e.code == 404, bad
    finally:
        httpd.shutdown()


def test_yuv420_roundtrip():
    import jax
    import jax.numpy as jnp

    from lzzx_nerf_tpu.utils import rgb_to_yuv420, yuv420_to_rgb

    # smooth content (what a rendered head is) — 4:2:0 keeps it near-exact;
    # random per-pixel chroma would be destroyed by subsampling by design
    yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 48),
                         indexing="ij")
    img = jnp.asarray(np.stack([yy, xx, 0.5 + 0.4 * yy * xx], -1),
                      jnp.float32)
    buf = np.asarray(jax.jit(rgb_to_yuv420)(img))
    assert buf.shape == (32 * 48 * 3 // 2,) and buf.dtype == np.uint8
    back = yuv420_to_rgb(buf, 32, 48)
    assert np.abs(back - np.asarray(img)).mean() < 0.02
    # flat colors roundtrip tightly (no chroma detail to lose)
    flat = jnp.full((16, 16, 3), 0.5)
    fbuf = np.asarray(rgb_to_yuv420(flat))
    np.testing.assert_allclose(yuv420_to_rgb(fbuf, 16, 16), 0.5, atol=0.01)


def test_filtered_sink_applies_frame_filter(tmp_path):
    """FilteredSink (the GFPGAN-restoration slot, TrainerUtil.py:743-757)
    decodes rgb24 frames, applies the filter, and re-encodes; it refuses
    yuv420p inner sinks."""
    from lzzx_nerf_tpu.serving.streaming import FilteredSink, _FfmpegSink

    class MemSink(RawFileSink):
        width, height = 4, 2

    inner = MemSink(str(tmp_path / "out.raw"))
    sink = FilteredSink(inner, lambda f: 255 - f)   # invert
    frame = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    sink.push(frame.tobytes())
    sink.close()
    got = np.frombuffer((tmp_path / "out.raw").read_bytes(), np.uint8)
    np.testing.assert_array_equal(got.reshape(2, 4, 3), 255 - frame)

    class Yuv(_FfmpegSink):
        def _output_args(self):
            return []

    with pytest.raises(ValueError):
        FilteredSink(Yuv(4, 2, pix_fmt="yuv420p"), lambda f: f)


def test_load_face_restorer_gated():
    """Without the optional gfpgan package, the loader raises with clear
    instructions instead of failing deep inside serving."""
    from lzzx_nerf_tpu.serving.streaming import load_face_restorer

    try:
        import gfpgan  # noqa: F401
        pytest.skip("gfpgan installed; gating not exercised")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="gfpgan"):
        load_face_restorer()


def test_webapi_serves_browser_ui(tmp_path):
    """GET / serves the player page (the reference's webrtc.py UI analogue):
    the upload -> feature -> infer -> poll state machine must be present."""
    import threading
    import urllib.request

    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.webapi import serve

    httpd = serve(Config(), host="127.0.0.1", port=0,
                  data_root=str(tmp_path), trial_root=str(tmp_path))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert r.headers.get("Content-Type", "").startswith("text/html")
            page = r.read().decode()
        for hook in ("/api/model_select", "/api/audio_upload",
                     "/api/inference", "/api/status", "result.mp4", "whep",
                     # round 3: browser mic -> 16 kHz WAV path, WHEP
                     # reconnect backoff, HLS fallback
                     "getUserMedia", "encodeWav", "retryWhep", "attachHls",
                     # bundled MSE fMP4-HLS client (no CDN/hls.js needed)
                     "playFmp4Hls", "parsePlaylist", "EXT-X-MAP", "hls_url",
                     # server-side .npy features (audFromNdarray analogue)
                     "useNpy", "aud_path",
                     # live mode: mic chunks stream while speaking
                     "audio_chunk", "audio_end", "maybeFlushLive"):
            assert hook in page, f"UI missing {hook}"
    finally:
        httpd.shutdown()


def _make_session_workspace(root, H=40, W=40, focal_mult=1.5,
                            blob_occ=False, **cfg_kw):
    """Toy dataset + untrained-but-saved checkpoint for InferenceSession
    tests (no training loop: the session only needs loadable state).

    blob_occ=True writes a sparse two-blob occupancy instead of all-ones
    — with H=W=64 and focal_mult=4 (portrait-like narrow FOV) the session
    resolves the PRODUCTION march plan (group-2 + prepass, and the
    bucketed march when the span spread warrants it) instead of stepping
    down to the per-ray fallback on toy geometry."""
    import jax.numpy as jnp
    from conftest import make_toy_dataset

    from lzzx_nerf_tpu.cli import _build_world
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.data.provider import NeRFDataset
    from lzzx_nerf_tpu.train import TrainState, Trainer, build_optimizer

    data = root / "data"
    make_toy_dataset(data, H=H, W=W, focal_mult=focal_mult)

    cfg = Config(**{"path": str(data), "workspace": str(root / "ws"),
                    "asr_model": "deepspeech", "grid_size": 32,
                    "max_steps": 8, **cfg_kw})
    ds = NeRFDataset(cfg, type="train")
    settings, occ, field, params = _build_world(cfg, ds)
    if blob_occ:
        from lzzx_nerf_tpu.data.synthetic import two_blob_occupancy

        occ = occ._replace(occ=two_blob_occupancy(occ.occ.shape[1]))
    else:
        # fully-occupied grid: rendered pixels depend on the (random-init)
        # field + audio encoding, so EMA/budget behaviors are observable
        occ = occ._replace(occ=jnp.ones_like(occ.occ))
    tx = build_optimizer(cfg.lr, cfg.lr_net, cfg.iters)
    state = TrainState.create(params, tx)
    Trainer(str(root / "ws")).save_checkpoint(state, occ)
    return str(data), str(root / "ws")


@pytest.fixture(scope="module")
def session_workspace(tmp_path_factory):
    return _make_session_workspace(tmp_path_factory.mktemp("sess"))


def test_session_frames_invariant_to_chunk_size(session_workspace):
    """The streamed frames must be IDENTICAL whatever infer_chunk is: the
    tail-chunk padding repeats the last frame to fill the static scan shape
    but must not advance the carried smooth-lips EMA (round-2 review weak
    item 6 — padded slots previously stepped the EMA up to C-1 extra times,
    so the state carried into the next run() depended on the chunk size)."""
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.session import InferenceSession

    data, ws = session_workspace
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((6, 16, 29)).astype(np.float32)

    def run_frames(chunk):
        # budget_frac=1: budget sits at the whole-frame cap, so the
        # adaptive-budget rebuild can never fire mid-run (rebuild timing
        # depends on chunk boundaries and would break the invariance)
        cfg = Config(asr_model="deepspeech", grid_size=32, max_steps=8,
                     infer_samples=8, infer_window_candidates=24,
                     infer_chunk=chunk, budget_frac=1.0)
        s = InferenceSession(cfg)
        s.load_model(data, ws)
        n = s.set_audio_features(feats)
        got = {}
        s.run(max_frames=n, on_frame=lambda i, buf: got.__setitem__(i, buf))
        # a second run continues from the carried EMA state — it must match
        # across chunkings too (this is where tail padding used to leak)
        s.set_audio_features(feats)  # resets EMA like a fresh upload
        first = dict(got)
        got.clear()
        s.run(max_frames=n, on_frame=lambda i, buf: got.__setitem__(i, buf))
        return first, got

    # 6 frames: chunk=3 divides evenly (no padding), chunk=4 pads 2 slots,
    # chunk=5 pads 4 slots
    base_a, base_b = run_frames(3)
    for chunk in (4, 5):
        got_a, got_b = run_frames(chunk)
        assert sorted(got_a) == sorted(base_a) == list(range(6))
        for i in range(6):
            np.testing.assert_array_equal(got_a[i], base_a[i])
            np.testing.assert_array_equal(got_b[i], base_b[i])


def test_run_live_matches_offline(session_workspace):
    """run_live (incremental feature drips — the live mic/ASR serving mode)
    must emit BIT-IDENTICAL frames to one offline run() over the
    concatenated features: the chunk lattice stays anchored at frame 0, a
    frame waits for its attention window's right context (att=2 looks 3
    frames ahead), the stream tail flushes with the offline end-padding,
    and the smooth-lips EMA carries across the internal run() segments."""
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.session import InferenceSession

    data, ws = session_workspace
    rng = np.random.default_rng(11)
    feats = rng.standard_normal((9, 16, 29)).astype(np.float32)

    def make_session():
        cfg = Config(asr_model="deepspeech", grid_size=32, max_steps=8,
                     infer_samples=8, infer_window_candidates=24,
                     infer_chunk=3, budget_frac=1.0, smooth_lips=True)
        s = InferenceSession(cfg)
        s.load_model(data, ws)
        return s

    s = make_session()
    n = s.set_audio_features(feats)
    offline = {}
    s.run(max_frames=n, on_frame=lambda i, b: offline.__setitem__(i, b))

    s2 = make_session()
    live = {}

    def drips():
        # irregular segment sizes incl. an empty drip; with chunk=3 and
        # lookahead 3 this renders [0,3) mid-stream twice and flushes [6,9)
        at = 0
        for k in (1, 4, 0, 2, 2):
            yield feats[at:at + k]
            at += k

    n_live, _ = s2.run_live(
        drips(), on_frame=lambda i, b: live.__setitem__(i, b))
    assert n_live == 9
    assert sorted(live) == sorted(offline) == list(range(9))
    for i in range(9):
        np.testing.assert_array_equal(live[i], offline[i])

    # a SECOND live stream on the same session is a fresh utterance: the
    # smooth-lips EMA carried out of stream 1 must not leak into stream 2
    # (run_live resets it exactly like set_audio_features does offline)
    feats2 = rng.standard_normal((4, 16, 29)).astype(np.float32)
    n2 = s.set_audio_features(feats2)
    offline2 = {}
    s.run(max_frames=n2, on_frame=lambda i, b: offline2.__setitem__(i, b))
    live2 = {}
    s2.run_live(iter([feats2[:1], feats2[1:]]),
                on_frame=lambda i, b: live2.__setitem__(i, b))
    for i in range(4):
        np.testing.assert_array_equal(live2[i], offline2[i])

    # hours-long sessions trim the feature buffer (aud_offset bookkeeping):
    # force the trim at toy size (next_i must clear lookbehind=8 + stride)
    # and re-check bit-identity against a fresh offline oracle
    feats3 = rng.standard_normal((16, 16, 29)).astype(np.float32)
    n3 = s.set_audio_features(feats3)
    offline3 = {}
    s.run(max_frames=n3, on_frame=lambda i, b: offline3.__setitem__(i, b))
    s2._live_trim_stride = 3
    live3 = {}
    s2.run_live((feats3[i:i + 2] for i in range(0, 16, 2)),
                on_frame=lambda i, b: live3.__setitem__(i, b))
    assert s2.ds.aud_offset == 0          # restored for offline reuse
    assert len(s2.ds.aud_features) < 16   # the buffer actually shrank
    for i in range(16):
        np.testing.assert_array_equal(live3[i], offline3[i])


def test_webapi_live_audio_chunks(session_workspace, tmp_path):
    """The live REST protocol (/api/audio_chunk + /api/audio_end) must
    render exactly the frames an offline run() produces over the same
    features, streaming them into the sink while segments keep arriving
    (the reference has no REST live mode — its live path is the CLI ASR
    loop; this is the serving-side equivalent built on run_live)."""
    import io
    import json as js
    import os
    import shutil
    import threading
    import time as _time
    import urllib.request

    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.session import InferenceSession
    from lzzx_nerf_tpu.serving.webapi import serve

    data, ws = session_workspace
    root = os.path.dirname(data)
    # ServerState resolves workspace as trial_<model>; model name == "data"
    trial = os.path.join(root, "trial_data")
    if not os.path.isdir(trial):
        shutil.copytree(ws, trial)

    rng = np.random.default_rng(13)
    feats = rng.standard_normal((6, 16, 29)).astype(np.float32)

    def mkcfg():
        return Config(asr_model="deepspeech", grid_size=32, max_steps=8,
                      infer_samples=8, infer_window_candidates=24,
                      infer_chunk=2, budget_frac=1.0, smooth_lips=True)

    # offline oracle on the same checkpoint/features
    s = InferenceSession(mkcfg())
    s.load_model(data, ws)
    n = s.set_audio_features(feats)
    offline = {}
    s.run(max_frames=n, on_frame=lambda i, b: offline.__setitem__(i, b))

    raw_out = str(tmp_path / "live.raw")
    httpd = serve(mkcfg(), host="127.0.0.1", port=0, data_root=root,
                  trial_root=root, sink_kind="raw", out_path=raw_out)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def post(route, body, ctype):
        req = urllib.request.Request(base + route, body,
                                     {"Content-Type": ctype})
        with urllib.request.urlopen(req) as r:
            return js.loads(r.read())

    def npy_bytes(a):
        bio = io.BytesIO()
        np.save(bio, a)
        return bio.getvalue()

    try:
        r = post("/api/model_select", js.dumps({"model": "data"}).encode(),
                 "application/json")
        assert r["model"] == "data" and r["status"] == "success"

        # reference-compat blocking form first (its GET /api/inference
        # returns only after the render completes, webapi.py:70-107);
        # the live stream below resets the smooth-lips EMA at start, so
        # this extra utterance cannot perturb the live-vs-offline compare
        npy_path = os.path.join(root, "wait_feats.npy")
        np.save(npy_path, feats)
        r = post("/api/audio_upload",
                 js.dumps({"aud_path": npy_path}).encode(),
                 "application/json")
        assert r["aud_frames"] == 6, r
        with urllib.request.urlopen(f"{base}/api/inference?wait=1") as resp:
            r = js.loads(resp.read())
        assert r.get("done") and r["frames_done"] == 6, r
        with urllib.request.urlopen(f"{base}/api/status") as resp:
            assert not js.loads(resp.read())["busy"]

        # live chunks before any /api/inference call; status flips live
        r = post("/api/audio_chunk", npy_bytes(feats[:2]),
                 "application/octet-stream")
        assert r == {"queued_frames": 2, "live": True,
                     "status": "success"}
        with urllib.request.urlopen(f"{base}/api/status") as resp:
            st = js.loads(resp.read())
        assert st["live"] and st["busy"]
        post("/api/audio_chunk", npy_bytes(feats[2:5]),
             "application/octet-stream")
        post("/api/audio_chunk", npy_bytes(feats[5:]),
             "application/octet-stream")
        r = post("/api/audio_end", b"", "application/octet-stream")
        assert r == {"ended": True, "status": "success"}
        for _ in range(600):
            with urllib.request.urlopen(f"{base}/api/status") as resp:
                st = js.loads(resp.read())
            if not st["busy"]:
                break
            _time.sleep(0.2)
        assert st["error"] is None, st
        assert not st["live"] and st["frames_done"] == 6
        assert st["aud_frames"] == 6
        # ending again is a clean error, not a crash; errors carry the
        # reference-compat status
        r = post("/api/audio_end", b"", "application/octet-stream")
        assert "error" in r and r["status"] == "fail"
    finally:
        httpd.shutdown()

    got = open(raw_out, "rb").read()
    want = b"".join(np.asarray(offline[i]).tobytes() for i in range(6))
    assert got == want


def test_play_through_degrades_without_audio_stack(monkeypatch):
    """--asr_play must pass chunks through unchanged (and in order) when no
    speaker backend exists, not die in the render loop. sounddevice is
    force-blocked so the degraded branch runs even on hosts with audio."""
    import sys

    from lzzx_nerf_tpu.serving.asr import play_through

    monkeypatch.setitem(sys.modules, "sounddevice", None)  # import -> error
    chunks = [np.full(320, i, np.float32) for i in range(5)]
    out = list(play_through(iter(chunks)))
    assert len(out) == 5
    for a, b in zip(out, chunks):
        np.testing.assert_array_equal(a, b)


def test_run_asr_live_family_guard(session_workspace):
    """--asr on a deepspeech-family model must fail fast with instructions
    (its features come from the offline tool — reference process.py:29),
    not crash inside the feature loop."""
    from lzzx_nerf_tpu.cli import run_asr_live
    from lzzx_nerf_tpu.config import Config

    data, ws = session_workspace
    cfg = Config(path=data, workspace=ws, asr=True,
                 asr_model="deepspeech", grid_size=32, max_steps=8,
                 infer_samples=8, infer_window_candidates=24)
    with pytest.raises(RuntimeError, match="streaming CTC"):
        run_asr_live(cfg)


def test_live_pcm_carry_keeps_frame_rate():
    """_live_pcm_feats must continue HuBERT's sample lattice across chunk
    boundaries: arbitrary chunkings consume exactly 640 samples per video
    frame with the 80-sample CNN edge carried, so the chunked feature
    stream equals the whole-utterance one frame-for-frame (no per-chunk
    remainder discard -> no cumulative A/V drift)."""
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.webapi import ServerState

    st = ServerState(Config())

    class FakeHubert:
        # alignment-sensitive stand-in with HuBERT's exact sample budget:
        # k = (N - 80) // 640 frames; frame i summarizes samples
        # [640i, 640(i+1)) so any lattice slip changes the values
        def features(self, data):
            k = max(0, (len(data) - 80) // 640)
            return np.asarray(data[:k * 640],
                              np.float32).reshape(k, 640)[:, ::40]

    st.hubert = FakeHubert()
    rng = np.random.default_rng(17)
    pcm = rng.standard_normal(3 * 16000 + 321).astype(np.float32)
    whole = st.hubert.features(pcm)
    assert len(whole) == 75  # 3.02 s -> 75 whole frames

    got = []
    # uneven chunking incl. a sub-frame drip (16100->16500 is 400 samples)
    for part in np.split(pcm, [1000, 9000, 16100, 16500, 40000]):
        f = st._live_pcm_feats(part)
        if f is not None:
            got.append(f)
    # audio_end's tail flush on the carried remainder
    f = st._live_streamer.flush()
    if f is not None:
        got.append(f)
    got = np.concatenate(got)
    np.testing.assert_array_equal(got[:len(whole)], whole)
    # the flush may add at most the final sub-frame worth of content
    assert len(got) - len(whole) <= 1

    # the generator form (cli.run_asr_live's hubert path) agrees too
    from lzzx_nerf_tpu.audio import HubertStreamer

    streamed = list(HubertStreamer(st.hubert).feature_stream(
        np.split(pcm, [1000, 9000, 16100, 16500, 40000])))
    np.testing.assert_array_equal(
        np.concatenate(streamed)[:len(whole)], whole)


def test_webapi_live_under_concurrent_polling(session_workspace, tmp_path):
    """Concurrency soak: while a live stream renders, parallel clients
    hammer /api/status and /api/models and an interloper tries
    /api/audio_upload and /api/inference — nothing may 500, the
    interlopers must be refused (busy guard), and the rendered output
    must still be byte-complete and in order."""
    import io
    import json as js
    import os
    import shutil
    import threading
    import time as _time
    import urllib.error
    import urllib.request

    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.webapi import serve

    data, ws = session_workspace
    root = os.path.dirname(data)
    trial = os.path.join(root, "trial_data")
    if not os.path.isdir(trial):
        shutil.copytree(ws, trial)
    rng = np.random.default_rng(23)
    feats = rng.standard_normal((10, 16, 29)).astype(np.float32)

    raw_out = str(tmp_path / "soak.raw")
    cfg = Config(asr_model="deepspeech", grid_size=32, max_steps=8,
                 infer_samples=8, infer_window_candidates=24,
                 infer_chunk=2, budget_frac=1.0, smooth_lips=True)
    httpd = serve(cfg, host="127.0.0.1", port=0, data_root=root,
                  trial_root=root, sink_kind="raw", out_path=raw_out)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    failures = []

    def post(route, body, ctype="application/octet-stream"):
        req = urllib.request.Request(base + route, body,
                                     {"Content-Type": ctype})
        with urllib.request.urlopen(req) as r:
            return js.loads(r.read())

    def npy_bytes(a):
        bio = io.BytesIO()
        np.save(bio, a)
        return bio.getvalue()

    def poller(route):
        try:
            for _ in range(60):
                with urllib.request.urlopen(base + route) as r:
                    js.loads(r.read())
                _time.sleep(0.02)
        except Exception as e:   # any 5xx/parse failure is a finding
            failures.append(f"{route}: {e}")

    def interloper():
        # uploads/inference during a live stream must be REFUSED, not 500
        try:
            for _ in range(10):
                r = post("/api/audio_upload",
                         js.dumps({"aud_path": os.path.join(
                             data, "aud_ds.npy")}).encode(),
                         "application/json")
                with urllib.request.urlopen(
                        f"{base}/api/inference") as resp:
                    js.loads(resp.read())
                _time.sleep(0.03)
        except urllib.error.HTTPError as e:
            failures.append(f"interloper HTTP {e.code}")
        except Exception as e:
            failures.append(f"interloper: {e}")

    try:
        r = post("/api/model_select",
                 js.dumps({"model": "data"}).encode(), "application/json")
        assert r["model"] == "data"
        threads = [threading.Thread(target=poller, args=("/api/status",)),
                   threading.Thread(target=poller, args=("/api/models",)),
                   threading.Thread(target=interloper)]
        r = post("/api/audio_chunk", npy_bytes(feats[:2]))
        assert r.get("live"), r
        for t in threads:
            t.start()
        for i in range(2, 10, 2):
            post("/api/audio_chunk", npy_bytes(feats[i:i + 2]))
            _time.sleep(0.05)
        post("/api/audio_end", b"")
        for t in threads:
            t.join()
        for _ in range(600):
            with urllib.request.urlopen(f"{base}/api/status") as resp:
                st = js.loads(resp.read())
            if not st["busy"]:
                break
            _time.sleep(0.2)
        assert st["error"] is None, st
        assert st["frames_done"] == 10, st
        assert not failures, failures
    finally:
        httpd.shutdown()
    # byte-complete output: 10 frames of H*W*3 (toy dataset is 40x40)
    assert os.path.getsize(raw_out) == 10 * 40 * 40 * 3


def test_multipart_audio_field_parses():
    """The reference client uploads as multipart form field 'audio'
    (webapi.py:110-118) — the stdlib-only parser must recover the exact
    file bytes (including CRLF-sensitive binary payloads)."""
    from lzzx_nerf_tpu.serving.webapi import _parse_multipart_file

    payload = b"RIFF\x00\x01\r\n\x02binary\r\n"
    boundary = "----testboundary42"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="other"\r\n\r\n'
        "junk\r\n"
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="audio"; '
        'filename="a.wav"\r\n'
        "Content-Type: audio/wav\r\n\r\n").encode() + payload + (
        f"\r\n--{boundary}--\r\n").encode()
    got = _parse_multipart_file(
        body, f'multipart/form-data; boundary={boundary}')
    assert got == payload
    with pytest.raises(ValueError, match="audio"):
        _parse_multipart_file(
            body.replace(b' name="audio"', b' name="sound"'),
            f"multipart/form-data; boundary={boundary}")
    # a DIFFERENT field whose filename is "audio" must not match
    with pytest.raises(ValueError, match="audio"):
        _parse_multipart_file(
            body.replace(b' name="audio"', b' name="sound"')
                .replace(b'filename="a.wav"', b'filename="audio"'),
            f"multipart/form-data; boundary={boundary}")
    with pytest.raises(ValueError, match="boundary"):
        _parse_multipart_file(body, "multipart/form-data")


def test_run_closes_sink_on_failure(session_workspace):
    """A sink failure mid-run must not leak the sink: run() (and
    run_live(), which owns the sink when close_sink=False) close it on
    the error path too — an abandoned ffmpeg leaks its pump fd and
    leaves an 'event' playlist without EXT-X-ENDLIST."""
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.session import InferenceSession

    data, ws = session_workspace
    cfg = Config(asr_model="deepspeech", grid_size=32, max_steps=8,
                 infer_samples=8, infer_window_candidates=24,
                 infer_chunk=2, budget_frac=1.0)
    s = InferenceSession(cfg)
    s.load_model(data, ws)
    feats = np.random.default_rng(21).standard_normal(
        (4, 16, 29)).astype(np.float32)

    class BoomSink:
        def __init__(self):
            self.closed = 0

        def push(self, b):
            raise RuntimeError("boom")

        def close(self):
            self.closed += 1

    n = s.set_audio_features(feats)
    sink = BoomSink()
    with pytest.raises(RuntimeError, match="boom"):
        s.run(sink, max_frames=n)
    assert sink.closed == 1

    sink2 = BoomSink()
    with pytest.raises(RuntimeError, match="boom"):
        s.run_live(iter([feats]), sink2)
    assert sink2.closed >= 1


def test_session_frame_parallel_matches_serial(session_workspace):
    """infer_data_parallel=4 (frame-parallel chunks over a 4-device mesh,
    shard_map) must stream BIT-IDENTICAL frames to the serial chunk
    program: the smooth-lips EMA chain is precomputed serially before the
    fan-out, so parallelism never reorders or re-times the only
    cross-frame dependency. Also checks the chunk is rounded up to a
    mesh multiple (infer_chunk=3 -> 4)."""
    import jax

    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.session import InferenceSession

    assert jax.device_count() >= 4  # conftest forces the 8-CPU platform
    data, ws = session_workspace
    rng = np.random.default_rng(9)
    feats = rng.standard_normal((6, 16, 29)).astype(np.float32)

    def run_frames(**kw):
        cfg = Config(asr_model="deepspeech", grid_size=32, max_steps=8,
                     infer_samples=8, infer_window_candidates=24,
                     budget_frac=1.0, smooth_lips=True, **kw)
        s = InferenceSession(cfg)
        s.load_model(data, ws)
        n = s.set_audio_features(feats)
        got = {}
        s.run(max_frames=n, on_frame=lambda i, buf: got.__setitem__(i, buf))
        return got

    base = run_frames(infer_chunk=3)
    par = run_frames(infer_chunk=3, infer_data_parallel=4)
    assert sorted(par) == sorted(base) == list(range(6))
    for i in range(6):
        np.testing.assert_array_equal(par[i], base[i])


def test_session_multicascade_falls_back_to_full_marcher(tmp_path, capsys):
    """bound > 1 (cascade > 1) must serve through the exhaustive marcher
    with an explicit notice instead of tripping the compact-path assertion
    (round-2 review missing item 4; reference marches any cascade count,
    raymarching.cu:42-54)."""
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.session import InferenceSession

    data, ws = _make_session_workspace(tmp_path, bound=2.0, max_steps=16)
    cfg = Config(asr_model="deepspeech", grid_size=32, bound=2.0,
                 max_steps=16, infer_samples=16, infer_chunk=2)
    s = InferenceSession(cfg)
    s.load_model(data, ws)
    assert "cascade" in capsys.readouterr().out
    rng = np.random.default_rng(1)
    n = s.set_audio_features(
        rng.standard_normal((2, 16, 29)).astype(np.float32))
    got = {}
    s.run(max_frames=n, on_frame=lambda i, buf: got.__setitem__(i, buf))
    assert sorted(got) == list(range(n))
    for buf in got.values():
        assert np.isfinite(buf.astype(np.float32)).all()


def test_session_adaptive_budget_rebuild(session_workspace, capsys):
    """A frame whose active-ray demand exceeds the initial budget must
    trigger ONE rebuild warning and a render-program rebuild at the next
    chunk boundary; frames keep streaming meanwhile (none dropped), and
    frames rendered after the rebuild match a session that started with the
    big budget (round-2 review item 6 — previously the session clipped rays
    to background forever with a single warning)."""
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.session import InferenceSession

    data, ws = session_workspace
    rng = np.random.default_rng(9)
    feats = rng.standard_normal((6, 16, 29)).astype(np.float32)

    def run(budget_frac):
        cfg = Config(asr_model="deepspeech", grid_size=32, max_steps=8,
                     infer_samples=8, infer_window_candidates=24,
                     infer_chunk=2, budget_frac=budget_frac)
        s = InferenceSession(cfg)
        s.load_model(data, ws)
        n = s.set_audio_features(feats)
        got = {}
        s.run(max_frames=n, on_frame=lambda i, buf: got.__setitem__(i, buf))
        return s, got

    s_small, got_small = run(0.05)
    out = capsys.readouterr().out
    assert "rebuilding the render program" in out
    # 40x40 = 1600 rays but frame_cap = 1536 (gran 256): once the adaptive
    # budget saturates at the cap, the 64-ray overflow must still be
    # reported (once) — the silent growth-phase branch must NOT consume the
    # warn-once flag (round-3 review find: it previously set
    # _overflow_warned while budget < frame_cap, permanently silencing
    # this warning)
    assert out.count("rendered as background") == 1
    s_big, got_big = run(1.0)
    # no frames dropped, budget grew to the big session's value
    assert sorted(got_small) == list(range(6))
    assert s_small.budget == s_big.budget > 256
    # frames after the rebuild (chunk 2+: frames 4..5) render at the full
    # budget — identical to the always-big session
    np.testing.assert_array_equal(got_small[5], got_big[5])
    # at least one early frame was visibly clipped vs the big session
    # (the demand here exceeds the tiny initial budget many times over)
    assert any(not np.array_equal(got_small[i], got_big[i])
               for i in range(2))


def test_session_sample_compaction_exact_and_adaptive(session_workspace,
                                                      capsys):
    """Config.infer_sample_frac compacts the stage-1 field eval to the
    march-masked points. At a budget that holds every masked point the
    streamed frames must be IDENTICAL to the uncompacted session; a budget
    that overflows must warn once, rebuild at the next chunk boundary
    (like the adaptive ray budget), and stream every frame — with the
    post-rebuild frames matching the uncompacted session."""
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.session import InferenceSession

    data, ws = session_workspace
    rng = np.random.default_rng(11)
    feats = rng.standard_normal((6, 16, 29)).astype(np.float32)

    def run(sample_frac):
        cfg = Config(asr_model="deepspeech", grid_size=32, max_steps=8,
                     infer_samples=8, infer_window_candidates=24,
                     infer_chunk=2, budget_frac=1.0,
                     infer_sample_frac=sample_frac)
        s = InferenceSession(cfg)
        s.load_model(data, ws)
        n = s.set_audio_features(feats)
        got = {}
        s.run(max_frames=n, on_frame=lambda i, buf: got.__setitem__(i, buf))
        return s, got

    s_off, base = run(0.0)
    assert s_off.sample_budget == 0
    # frac=1.0 -> the full point lattice: compaction is a pure
    # permutation+scatter and must not change a pixel
    s_full, full = run(1.0)
    assert s_full.sample_budget == s_full._sample_cap
    capsys.readouterr()
    for i in range(6):
        np.testing.assert_array_equal(full[i], base[i])

    # a deliberately tiny sample budget (toy grid is fully occupied ->
    # nearly all stage-1 slots are masked on) must overflow and rebuild
    s_tiny, tiny = run(0.05)
    out = capsys.readouterr().out
    assert "sample budget" in out and "rebuilding" in out
    assert sorted(tiny) == list(range(6))        # no frames dropped
    assert s_tiny.sample_budget > 0
    # frames after the rebuild (chunk 2+: frames 4..5) carry every masked
    # point again — identical to the uncompacted session
    np.testing.assert_array_equal(tiny[5], base[5])
    # at least one pre-rebuild frame was visibly degraded
    assert any(not np.array_equal(tiny[i], base[i]) for i in range(2))


ffmpeg_required = pytest.mark.skipif(
    __import__("shutil").which("ffmpeg") is None
    or __import__("shutil").which("ffprobe") is None,
    reason="ffmpeg/ffprobe not on PATH (run on a host with ffmpeg — "
           "see .claude/skills/verify)")


def _probe(path, entries="stream=nb_read_frames,width,height"):
    import json as js
    import subprocess

    out = subprocess.run(
        ["ffprobe", "-v", "error", "-count_frames", "-select_streams", "v:0",
         "-show_entries", entries, "-of", "json", str(path)],
        capture_output=True, text=True, check=True).stdout
    return js.loads(out)["streams"][0]


@ffmpeg_required
def test_mp4_sink_produces_playable_file(tmp_path):
    """N synthetic frames through FfmpegMp4Sink must yield an mp4 that
    ffprobe decodes back to exactly N frames at the right geometry
    (round-2 review item 5: the sinks were command-construction-tested
    only; reference behavior ConsumeMQByWebRTC.py:87-133)."""
    from lzzx_nerf_tpu.serving.streaming import FfmpegMp4Sink

    W = H = 64
    N = 12
    sink = FfmpegMp4Sink(str(tmp_path / "out.mp4"), W, H, fps=25)
    sink.open()
    rng = np.random.default_rng(0)
    for i in range(N):
        # yuv420p frames (the sink's default ingest format)
        buf = rng.integers(16, 235, W * H * 3 // 2, dtype=np.uint8)
        sink.push(buf.tobytes())
    sink.close()
    st = _probe(tmp_path / "out.mp4")
    assert int(st["nb_read_frames"]) == N
    assert (st["width"], st["height"]) == (W, H)


@ffmpeg_required
def test_hls_sink_produces_playlist_and_segments(tmp_path):
    from lzzx_nerf_tpu.serving.streaming import FfmpegHlsSink

    W = H = 64
    N = 60  # > one 1-2s segment at 25 fps
    out = tmp_path / "hls"
    out.mkdir()
    sink = FfmpegHlsSink(str(out), W, H, fps=25)
    sink.open()
    for i in range(N):
        buf = np.full(W * H * 3 // 2, 64 + 2 * i, np.uint8)
        sink.push(buf.tobytes())
    sink.close()
    m3u8 = list(out.glob("*.m3u8"))
    assert m3u8, list(out.iterdir())
    text = m3u8[0].read_text()
    segs = [ln for ln in text.splitlines() if ln and not ln.startswith("#")]
    assert segs, text
    for seg in segs:
        assert (out / seg).exists() and (out / seg).stat().st_size > 0
    # segments decode
    st = _probe(out / segs[0])
    assert int(st["nb_read_frames"]) > 0


@ffmpeg_required
def test_hls_fmp4_sink_stream_appends_like_mse(tmp_path):
    """fMP4 mode end-to-end: the playlist must declare EXT-X-MAP init.mp4
    and ordered .m4s fragments, and byte-concatenating init + fragments —
    exactly what player.html::playFmp4Hls feeds a SourceBuffer — must
    decode back to every pushed frame."""
    from lzzx_nerf_tpu.serving.streaming import FfmpegHlsSink

    W = H = 64
    N = 60
    out = tmp_path / "hls"
    out.mkdir()
    sink = FfmpegHlsSink(str(out), W, H, fps=25, segment_type="fmp4")
    sink.open()
    for i in range(N):
        buf = np.full(W * H * 3 // 2, 64 + 2 * i, np.uint8)
        sink.push(buf.tobytes())
    sink.close()
    text = (out / "stream.m3u8").read_text()
    assert '#EXT-X-MAP:URI="init.mp4"' in text, text
    assert "#EXT-X-ENDLIST" in text
    segs = [ln for ln in text.splitlines() if ln and not ln.startswith("#")]
    assert segs and all(s.endswith(".m4s") for s in segs), text
    stream = tmp_path / "mse_append.mp4"
    with open(stream, "wb") as f:
        f.write((out / "init.mp4").read_bytes())
        for seg in segs:
            f.write((out / seg).read_bytes())
    st = _probe(stream)
    assert int(st["nb_read_frames"]) == N
    assert (st["width"], st["height"]) == (W, H)


@ffmpeg_required
def test_hls_fmp4_sink_muxes_audio_track(tmp_path):
    """With a driving wav, the packaged stream must carry BOTH tracks —
    the silent-lips bug class (review finding: the live stream played
    video-only); also pins the hls_codecs contract the MSE player uses."""
    import subprocess

    from scipy.io import wavfile

    from lzzx_nerf_tpu.serving.streaming import FfmpegHlsSink

    W = H = 64
    N = 50   # 2 s of video
    sr = 16000
    t = np.arange(2 * sr) / sr
    wav_path = tmp_path / "drive.wav"
    wavfile.write(wav_path, sr,
                  (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype(
                      np.int16))
    out = tmp_path / "hls"
    out.mkdir()
    sink = FfmpegHlsSink(str(out), W, H, fps=25, segment_type="fmp4",
                         audio_path=str(wav_path))
    sink.open()
    for i in range(N):
        sink.push(np.full(W * H * 3 // 2, 64 + i, np.uint8).tobytes())
    sink.close()
    assert sink.closed_ok
    # concatenate init + fragments (the MSE append stream) and probe
    text = (out / "stream.m3u8").read_text()
    segs = [ln for ln in text.splitlines() if ln and not ln.startswith("#")]
    stream = tmp_path / "mse.mp4"
    with open(stream, "wb") as f:
        f.write((out / "init.mp4").read_bytes())
        for seg in segs:
            f.write((out / seg).read_bytes())
    import json as js

    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-show_entries",
         "stream=codec_type,codec_name", "-of", "json", str(stream)],
        capture_output=True, text=True, check=True).stdout
    streams = js.loads(probe)["streams"]
    kinds = sorted(s["codec_type"] for s in streams)
    assert kinds == ["audio", "video"], streams
    assert any(s.get("codec_name") == "aac" for s in streams), streams


@ffmpeg_required
def test_overlay_sink_composites_crop_onto_source(tmp_path):
    """The overlay filter graph must actually run: build a tiny source
    video, push rendered frames, and check the output geometry matches the
    SOURCE (render overlaid at crop x,y) with the right frame count."""
    import subprocess

    from lzzx_nerf_tpu.serving.streaming import FfmpegOverlaySink

    SW, SH = 128, 96      # source geometry
    W = H = 64            # rendered crop
    N = 10
    src = tmp_path / "readySourceVideo.mp4"
    subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi",
         "-i", f"color=c=blue:s={SW}x{SH}:r=25:d=2",
         "-pix_fmt", "yuv420p", str(src)], check=True)
    sink = FfmpegOverlaySink(W, H, fps=25, ready_video=str(src),
                             crop_xy=(32, 16),
                             local_mp4=str(tmp_path / "out.mp4"))
    sink.open()
    for i in range(N):
        sink.push(np.full(sink.frame_bytes, 200, np.uint8).tobytes())
    sink.close()
    st = _probe(tmp_path / "out.mp4")
    assert (st["width"], st["height"]) == (SW, SH)
    assert int(st["nb_read_frames"]) >= N - 1  # shortest-input policy


def test_filtered_sink_preserves_frame_order():
    """Multi-frame pass-through: a (stateful) fake restorer must see frames
    strictly in push order and the inner sink must receive the restored
    frames in the same order (round-2 review weak item 8 — the GFPGAN slot
    was single-frame-tested only)."""
    from lzzx_nerf_tpu.serving.streaming import FilteredSink, FrameSink

    class CaptureSink(FrameSink):
        width, height = 4, 2
        pix_fmt = "rgb24"

        def __init__(self):
            self.frames = []

        def push(self, b):
            self.frames.append(np.frombuffer(b, np.uint8).reshape(2, 4, 3))

    seen = []

    def restorer(f):
        seen.append(int(f[0, 0, 0]))
        out = f.copy()
        out[..., 1] = len(seen)         # stamp the restoration order
        return out

    inner = CaptureSink()
    sink = FilteredSink(inner, restorer)
    for i in (10, 20, 30):
        frame = np.full((2, 4, 3), i, np.uint8)
        sink.push(frame.tobytes())
    assert seen == [10, 20, 30]
    assert [int(f[0, 0, 0]) for f in inner.frames] == [10, 20, 30]
    assert [int(f[0, 0, 1]) for f in inner.frames] == [1, 2, 3]
    assert sink.count == 3


def test_session_window_k2_escape_rebuild(session_workspace, capsys):
    """Window-truncation escape: a frame whose window needs more march
    candidates than the compiled K2 must warn, rebuild with the observed
    demand (+margin) at the next chunk boundary, and keep streaming every
    frame — post-rebuild frames identical to a correctly-sized session.
    This is the runtime guard for the round-3 K2-truncation find (a
    too-small K2 silently cuts far-side samples, −11 dB at grid 128;
    ops/march2.py); the reference's alive-ray marcher never truncates
    (renderer.py:503-548)."""
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.session import InferenceSession

    data, ws = session_workspace
    rng = np.random.default_rng(13)
    feats = rng.standard_normal((6, 16, 29)).astype(np.float32)

    def run(k2_override):
        cfg = Config(asr_model="deepspeech", grid_size=32, max_steps=8,
                     infer_samples=8, infer_chunk=2, budget_frac=1.0,
                     infer_window_candidates=k2_override)
        s = InferenceSession(cfg)
        s.load_model(data, ws)
        n = s.set_audio_features(feats)
        got = {}
        s.run(max_frames=n, on_frame=lambda i, buf: got.__setitem__(i, buf))
        return s, got

    # k2_override=0 -> trajectory-measured K2 (resolve_march_plan): the
    # correctly-sized control; it must never trip its own escape
    s_ok, ok = run(0)
    out_ok = capsys.readouterr().out
    assert "march candidates > K2" not in out_ok
    assert "trajectory-measured window candidates" in out_ok

    s_tiny, tiny = run(8)   # deliberately below the scene's need (12)
    out = capsys.readouterr().out
    assert "march candidates > K2" in out and "rebuilding with K2=" in out
    assert sorted(tiny) == list(range(6))        # no frames dropped
    assert s_tiny.k2 > 8                          # the rebuild actually ran
    # frames after the rebuild (chunk 2+: frames 4..5) march the full
    # window again — identical to the measured-K2 session. (Whether the
    # truncated EARLY frames differ visibly is scene-dependent — this toy
    # head is opaque enough that early termination hides the cut; the
    # trained-oracle quality guard is where truncation damage is measured,
    # scripts/quality_check.py variant H.)
    np.testing.assert_array_equal(tiny[5], ok[5])


def test_session_eval_budget_exact_and_escape(session_workspace, capsys):
    """infer_eval_frac (post-march field-eval re-compaction): a session with
    a generous eval budget must stream frames BIT-IDENTICAL to the default
    (eval off) session; a deliberately tiny eval budget must warn, rebuild
    with the observed real-block demand at the next chunk boundary, and
    stream post-rebuild frames identical to the control. (The window
    analysis's z-slab activity over-admits rays whose march finds zero
    occupied samples; those compose to exactly background — see
    render_rays_compact_blocks.)"""
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.session import InferenceSession

    data, ws = session_workspace
    rng = np.random.default_rng(17)
    feats = rng.standard_normal((6, 16, 29)).astype(np.float32)

    def run(eval_frac):
        cfg = Config(asr_model="deepspeech", grid_size=32, max_steps=8,
                     infer_samples=8, infer_chunk=2, budget_frac=1.0,
                     infer_eval_frac=eval_frac)
        s = InferenceSession(cfg)
        s.load_model(data, ws)
        n = s.set_audio_features(feats)
        got = {}
        s.run(max_frames=n, on_frame=lambda i, buf: got.__setitem__(i, buf))
        return s, got

    s_off, off = run(0.0)
    assert s_off.eval_budget == 0
    capsys.readouterr()

    # generous leg at 0.5: eval_budget < budget, so the renderer's
    # re-compaction branch (eval_budget // 4 < budget_b) genuinely runs —
    # at 1.0 the budgets coincide and the bit-exactness assertion would
    # exercise a no-op (advisor r4). If the toy head's real blocks exceed
    # even this budget the escape rebuilds at a chunk boundary; then only
    # post-rebuild frames are comparable (same contract as the tiny leg).
    s_on, on = run(0.5)
    out_on = capsys.readouterr().out
    assert s_on.eval_budget > 0
    assert sorted(on) == list(range(6))
    if "exceed eval budget" in out_on:
        # demand above the halved budget: the escape must have rebuilt
        # (either way the pre-rebuild chunks ran the re-compaction branch)
        assert "rebuilding with" in out_on
        np.testing.assert_array_equal(on[5], off[5])
    else:
        assert s_on.eval_budget < s_on.budget
        for i in range(6):
            np.testing.assert_array_equal(on[i], off[i])

    # tiny eval budget: rounds to the session's gran floor, the smallest
    # allowed — demand above it must trip the n_real escape
    s_tiny, tiny = run(1e-9)   # rounds to gran floor (256 at 64x64)
    out = capsys.readouterr().out
    assert sorted(tiny) == list(range(6))        # no frames dropped
    if "exceed eval budget" in out:
        # demand exceeded the floor: escape must have rebuilt and the
        # post-rebuild frames must match the control
        assert "rebuilding with" in out
        assert s_tiny.eval_budget > 256 or s_tiny.eval_budget == s_tiny.budget
        np.testing.assert_array_equal(tiny[5], off[5])
    else:
        # the toy head's real blocks fit even the floor: then the frames
        # are exact everywhere already
        for i in range(6):
            np.testing.assert_array_equal(tiny[i], off[i])


def test_session_production_march_plan_bit_parity(tmp_path):
    """On production-like geometry (64² frames, narrow FOV, sparse blob
    occupancy) the session must resolve the PRODUCTION march plan —
    group-2 block march + occupancy-true prepass (+ bucket when the span
    spread warrants it) — and stream frames BIT-IDENTICAL to the same
    model served with the prepass/bucket off (both are proven-exact
    optimizations; this is the session-level end-to-end check of the
    whole plan machinery incl. measure_bucket_plan sizing)."""
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.session import InferenceSession

    data, ws = _make_session_workspace(tmp_path, H=64, W=64, focal_mult=4.0,
                                       blob_occ=True)
    rng = np.random.default_rng(31)
    feats = rng.standard_normal((4, 16, 29)).astype(np.float32)

    def run(**kw):
        cfg = Config(asr_model="deepspeech", grid_size=32, max_steps=8,
                     infer_samples=8, infer_chunk=2, budget_frac=1.0,
                     **kw)
        s = InferenceSession(cfg)
        s.load_model(data, ws)
        n = s.set_audio_features(feats)
        got = {}
        s.run(max_frames=n, on_frame=lambda i, b: got.__setitem__(i, b))
        return s, got

    s_off, off = run(infer_march_prepass=False, infer_march_bucket=False)
    assert s_off.march_plan[:2] == (2, "nb5w") and not s_off.march_plan[2]

    s_on, on = run()
    assert s_on.march_plan == (2, "nb5w", True)
    # the sparse blob must produce span spread; if the measured plan
    # disables bucketing here the fixture lost its teeth — fail loudly
    assert s_on._bucket is not None and s_on._bucket[0] >= 8
    assert sorted(on) == sorted(off) == list(range(4))
    for i in off:
        np.testing.assert_array_equal(on[i], off[i])
