"""Profile the real 512² serving frame program with jax.profiler.

Builds the exact render_frame of bench.py (same shapes -> compile-cache hit),
traces a few frames, and prints the top device ops from the captured
.xplane.pb via tensorboard_plugin_profile's raw converter.
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from __graft_entry__ import _build
    from lzzx_nerf_tpu.ops.march2 import build_inference_tables
    from lzzx_nerf_tpu.render import render_rays_compact
    from lzzx_nerf_tpu.utils import get_rays

    res, S, K2 = 512, 8, 40
    settings, occ, field, params = _build(res=res, grid=128, max_steps=S)
    budget = max(1024, int(0.5 * res * res) // 1024 * 1024)
    pose = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5], [0, 0, 0, 1]],
        np.float32))[None]
    intr = (res / 0.6, res / 0.6, res / 2, res / 2)
    rays = get_rays(pose, intr, res, res, N=-1)
    rays_o, rays_d = rays["rays_o"][0], rays["rays_d"][0]
    bg = jnp.ones((res * res, 3))
    packed = jax.jit(lambda p: field.apply(p, method="bake_tables",
                                           dtype=jnp.bfloat16))(params)
    tables = jax.jit(lambda o: build_inference_tables(o, settings.bound))(
        occ.occ)

    @jax.jit
    def render_frame(params, packed, tables, occ, auds, eye):
        enc_a = field.apply(params, auds, method="encode_audio")
        c = params["params"]["individual_codes"][0]

        def apply_packed(p, *a, **kw):
            return field.apply(p, *a, packed=packed, **kw)

        out = render_rays_compact(apply_packed, params, settings, occ,
                                  rays_o, rays_d, enc_a, c, eye, bg,
                                  budget=budget, window_candidates=K2,
                                  tables=tables, minimal=True)
        return (jnp.clip(out["image"], 0, 1) * 255).astype(jnp.uint8)

    auds = jnp.zeros((8, 16, 1024))
    eye = jnp.asarray([0.25])
    img = render_frame(params, packed, tables, occ, auds, eye)
    np.asarray(img)
    print("warm; tracing...")

    logdir = "/tmp/jaxprof"
    os.system(f"rm -rf {logdir}")
    import time
    with jax.profiler.trace(logdir):
        for _ in range(5):
            img = render_frame(params, packed, tables, occ, auds, eye)
        jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(10):
        img = render_frame(params, packed, tables, occ, auds, eye)
    jax.block_until_ready(img)
    print(f"10 frames (no fetch): {(time.perf_counter()-t0)/10*1000:.1f} "
          "ms/frame")

    xp = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xp)
    if not xp:
        return
    try:
        from tensorflow.python.profiler import profiler_client  # noqa
    except Exception:
        pass
    # parse with the plugin's convert helpers
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

        params_ = {"tqx": "out:json;"}
        data, _ = r2t.xspace_to_tool_data(xp, "op_profile", params_)
        open("/tmp/jaxprof/op_profile.json", "w").write(
            data if isinstance(data, str) else data.decode())
        print("wrote /tmp/jaxprof/op_profile.json")
    except Exception as e:
        print("op_profile failed:", type(e).__name__, e)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

        data, _ = r2t.xspace_to_tool_data(xp, "hlo_stats", {})
        out = data if isinstance(data, str) else data.decode()
        open("/tmp/jaxprof/hlo_stats.json", "w").write(out)
        print("wrote /tmp/jaxprof/hlo_stats.json", len(out))
    except Exception as e:
        print("hlo_stats failed:", type(e).__name__, e)


if __name__ == "__main__":
    main()
