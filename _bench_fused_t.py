import time, functools
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from i3dr_stereo_tpu.ops.census import census_transform
from i3dr_stereo_tpu.ops.sgm_fused_t import census_sgm_wta_t

H, W, D = 2048, 2448, 32
Hp, Wp = 2048, 2560
rng = np.random.default_rng(0)
img = rng.uniform(0, 255, (1, Wp, Hp)).astype(np.float32)  # transposed-land
lT = jax.device_put(img)
rT = jax.device_put(np.roll(img, -8, axis=1))

@jax.jit
def full(lT, rT):
    clT = jnp.moveaxis(census_transform(lT, 9, 9), -1, 0)
    crT = jnp.moveaxis(census_transform(rT, 9, 9), -1, 0)
    disp, C = census_sgm_wta_t(clT, crT, D, bpm=-D//2, W_real=W, H_real=H,
                               p1=8.0, p2=64.0, directions=4)
    return disp

def timeit(name, f, *args, iters=3):
    o = f(*args); jax.block_until_ready(o)
    # chained honest timing
    def loop(K):
        @jax.jit
        def g(x, y):
            def body(c, _):
                out = f(x + c, y)
                return out.ravel()[0] * 1e-20, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c
        return g
    g1, g2 = loop(iters), loop(2*iters)
    float(g1(*args)); float(g2(*args))
    def run(g, b):
        t0 = time.perf_counter(); float(g(args[0]+b, args[1])); return time.perf_counter()-t0
    t1 = min(run(g1, 1e-3), run(g1, 2e-3)); t2 = min(run(g2, 3e-3), run(g2, 4e-3))
    print(name, round((t2-t1)/iters*1e3, 2), "ms", flush=True)

timeit("full_sgm_wta_t_L0_K32", full, lT, rT)
