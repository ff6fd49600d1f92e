"""Mosaic-lowered EVA kernel: correctness vs XLA path + timing, on real TPU."""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import jax
import jax.numpy as jnp
import numpy as np

from efficient_attention_tpu.attention import EVA

B, C, H = 128, 192, 3
x = jax.random.normal(jax.random.PRNGKey(0), (B, 28, 28, C), jnp.float32)

m_xla = EVA(dim=C, num_heads=H, window_size=7, num_landmarks=49,
            attn_2d=True, use_rpe=True, impl="xla")
m_pal = EVA(dim=C, num_heads=H, window_size=7, num_landmarks=49,
            attn_2d=True, use_rpe=True, impl="pallas")
m_pkd = EVA(dim=C, num_heads=H, window_size=7, num_landmarks=49,
            attn_2d=True, use_rpe=True, impl="packed")
m_sgl = EVA(dim=C, num_heads=H, window_size=7, num_landmarks=49,
            attn_2d=True, use_rpe=True, impl="packed",
            use_single_kernel=True)
params = jax.jit(lambda: m_xla.init(jax.random.PRNGKey(0), x[:1],
                                    deterministic=True))()

f_xla = jax.jit(lambda p, x: m_xla.apply(p, x, deterministic=True))
f_pal = jax.jit(lambda p, x: m_pal.apply(p, x, deterministic=True))
o1 = np.asarray(f_xla(params, x[:4]))
o2 = np.asarray(f_pal(params, x[:4]))
err = np.abs(o1 - o2).max()
print("max abs err xla vs pallas (f32):", err)
assert err < 3e-4, err  # 7.8e-5 measured after the chunk-mean precision fix
f_pkd = jax.jit(lambda p, x: m_pkd.apply(p, x, deterministic=True))
o3 = np.asarray(f_pkd(params, x[:4]))
err = np.abs(o1 - o3).max()
print("max abs err xla vs packed (f32):", err)
assert err < 3e-4, err  # 7.8e-5 measured after the chunk-mean precision fix
f_sgl = jax.jit(lambda p, x: m_sgl.apply(p, x, deterministic=True))
o4 = np.asarray(f_sgl(params, x[:4]))
err = np.abs(o1 - o4).max()
print("max abs err xla vs single (f32):", err)
assert err < 3e-4, err

def timed(f, p, x, iters=30):
    g = jax.jit(lambda p, x: f(p, x).sum())
    acc = g(p, x); float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        acc = acc + g(p, x)
    float(acc)
    return (time.perf_counter() - t0) / iters * 1e3

xb = x.astype(jnp.bfloat16)
pb = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), params)
print("xla    ms/iter:", round(timed(m_xla.apply and f_xla, pb, xb), 3))
print("pallas ms/iter:", round(timed(f_pal, pb, xb), 3))
print("packed ms/iter:", round(timed(f_pkd, pb, xb), 3))
print("single ms/iter:", round(timed(f_sgl, pb, xb), 3))
