"""Compare per-ray vs 2x2-block compact render at 512² (no-fetch device ms)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from __graft_entry__ import _build
from lzzx_nerf_tpu.ops.march2 import build_inference_tables
from lzzx_nerf_tpu.render import render_rays_compact, render_rays_compact_blocks
from lzzx_nerf_tpu.utils import get_rays

res, S, K2 = 512, 8, 40
settings, occ, field, params = _build(res=res, grid=128, max_steps=S)
budget = max(1024, int(0.5*res*res)//1024*1024)
pose = jnp.asarray(np.array([[1,0,0,0],[0,1,0,0],[0,0,1,-2.5],[0,0,0,1]], np.float32))[None]
intr = (res/0.6, res/0.6, res/2, res/2)
rays = get_rays(pose, intr, res, res, N=-1)
rays_o, rays_d = rays["rays_o"][0], rays["rays_d"][0]
bg = jnp.ones((res*res,3))
packed = jax.jit(lambda p: field.apply(p, method="bake_tables", dtype=jnp.bfloat16))(params)
tables = jax.jit(lambda o: build_inference_tables(o, settings.bound))(occ.occ)
enc_a = jax.jit(lambda p,a: field.apply(p,a,method="encode_audio"))(params, jnp.zeros((8,16,1024)))
eye = jnp.asarray([0.25]); c = params["params"]["individual_codes"][0]

def ap_factory():
    def ap(p, *a, **kw): return field.apply(p, *a, packed=packed, **kw)
    return ap

@jax.jit
def f_ray(params, occ, tables, enc_a, eye):
    out = render_rays_compact(ap_factory(), params, settings, occ, rays_o, rays_d,
                              enc_a, c, eye, bg, budget=budget,
                              window_candidates=K2, tables=tables, minimal=True)
    return (jnp.clip(out["image"],0,1)*255).astype(jnp.uint8)

@jax.jit
def f_blk(params, occ, tables, enc_a, eye):
    out = render_rays_compact_blocks(ap_factory(), params, settings, occ,
                                     rays_o[0], rays_d, res, res, enc_a, c, eye,
                                     bg, budget=budget, window_candidates=K2,
                                     tables=tables)
    return (jnp.clip(out["image"],0,1)*255).astype(jnp.uint8)

for name, f in (("per-ray", f_ray), ("block2x2", f_blk)):
    img = f(params, occ, tables, enc_a, eye); jax.block_until_ready(img)
    t0=time.perf_counter()
    for _ in range(20): img = f(params, occ, tables, enc_a, eye)
    jax.block_until_ready(img)
    print(f"{name}: {(time.perf_counter()-t0)/20*1000:6.1f} ms/frame", flush=True)
