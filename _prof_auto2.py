"""Stage timing of the auto-cull frame program (scratch)."""
import time, numpy as np, jax, jax.numpy as jnp
from nerf_siren_tpu.config import NeRFConfig
from nerf_siren_tpu.models.nerf import init_nerf
from nerf_siren_tpu.render.fast import init_proxy, render_rays_fast
from nerf_siren_tpu.ops.pallas.fused_mlp import pack_model_params
from nerf_siren_tpu.ops.pallas.proxy_march import pack_proxy_params, proxy_opacity, TILE_R

cfg = NeRFConfig()
params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
proxy = init_proxy(jax.random.PRNGKey(1))
packed = pack_model_params(params, cfg)
pp = pack_proxy_params(proxy)
R = 800 * 800
rp = R + (-R % TILE_R)
rng = np.random.default_rng(0)
d = rng.normal(size=(rp, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays8 = jnp.asarray(np.concatenate(
    [np.zeros((rp, 3), np.float32) + [0, 0, 4.0], d,
     np.full((rp, 1), 2.0, np.float32), np.full((rp, 1), 6.0, np.float32)], -1))
opac_h = rng.uniform(0, 1, rp).astype(np.float32)
opac = jnp.asarray(opac_h)
levels = 8
quantum = -(-rp // (levels * TILE_R)) * TILE_R
n_act = 5 * quantum                     # ~5/8 of the frame
print("rp", rp, "quantum", quantum, "n_act", n_act)

def timeit(name, f, *a, n=10, warm=3):
    g = jax.jit(f)
    for _ in range(warm):
        x = g(*a)
    jax.tree_util.tree_map(lambda t: float(jnp.sum(t)), x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = g(*a)
    jax.tree_util.tree_map(lambda t: float(jnp.sum(t)), x)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s}: {dt*1e3:8.2f} ms", flush=True)
    return x

timeit("prepass proxy_opacity", lambda r8: proxy_opacity(pp, r8.T, 32), rays8)
timeit("argsort 640K", lambda o: jnp.argsort(-o)[:n_act], opac)
idx = jnp.argsort(-opac)[:n_act]
timeit("gather rays (n_act,8) row-major", lambda r8, i: r8[i], rays8, idx)
timeit("gather rays lanes (8,rp)->(8,n_act)",
       lambda r8t, i: jnp.take(r8t, i, axis=1), rays8.T, idx)
act = rays8[idx]
common = dict(n_candidates=32, n_keep=16, nerf_cfg=cfg, white_back=True,
              select="pdf", packed_params=packed, packed_proxy=pp)
def render_act(a):
    tiles = a.reshape(n_act // quantum, quantum, 8)
    return jax.lax.map(lambda t: render_rays_fast(
        params, proxy, t, **common)["rgb_fine"], tiles)
timeit("render active 5/8 frame", render_act, act)
rgb_a = jax.jit(render_act)(act)

def scatter(i, rgb):
    return jnp.full((rp, 3), 1.0, jnp.float32).at[i].set(rgb.reshape(n_act, 3))
timeit("scatter rgb rows", scatter, idx, rgb_a)

def scatter_t(i, rgb):
    out = jnp.ones((3, rp), jnp.float32)
    return out.at[:, i].set(rgb.reshape(n_act, 3).T)
timeit("scatter rgb lanes (3,rp)", scatter_t, idx, rgb_a)

# one-hot-free alternative: render ALL rays reordered? n/a. combined program:
def full_prog(r8):
    o = proxy_opacity(pp, r8.T, 32)
    i = jnp.argsort(-o)[:n_act]
    a = r8[i]
    tiles = a.reshape(n_act // quantum, quantum, 8)
    rgb = jax.lax.map(lambda t: render_rays_fast(
        params, proxy, t, **common)["rgb_fine"], tiles)
    out = jnp.full((rp, 3), 1.0, jnp.float32).at[i].set(rgb.reshape(n_act, 3))
    return out, jnp.sum(o > 0.01)
timeit("combined frame program", full_prog, rays8, n=5)
