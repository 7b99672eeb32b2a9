"""Same pallas_call with jax_enable_x64 OFF during trace/execute."""
import sys; sys.path.insert(0, '/root/repo')
import math, time
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from nis_sar_amtigmti_video_tpu.ops.pallas.echo_kernel import echo_kernel_body
# package import turned x64 ON; turn it OFF for the pallas path
jax.config.update("jax_enable_x64", False)

def trial(name, P_, B_, NS_, PT, TB, NT):
    rng = np.random.default_rng(0)
    tau = jnp.asarray(rng.uniform(0.2e-6, 1e-6, (B_, P_)).astype(np.float32))
    car = jnp.asarray(rng.uniform(-3, 3, (B_, P_)).astype(np.float32))
    amp = jnp.asarray(rng.uniform(0.5, 2, (B_, P_)).astype(np.float32))
    tf = jnp.asarray(np.broadcast_to((np.arange(NS_)/60e6)[:, None],
                                     (NS_, PT)).astype(np.float32))
    kern = partial(echo_kernel_body, k_pi=math.pi*150e6/2e-6, shift=1e-6,
                   half=1e-6, target_tile=TB)
    f = jax.jit(lambda a1, a2, a3, a4: pl.pallas_call(
        kern, grid=(P_//PT, NS_//NT, B_//TB),
        in_specs=[pl.BlockSpec((TB, PT), lambda i, j, k: (k, i), memory_space=pltpu.VMEM)]*3 +
                 [pl.BlockSpec((NT, PT), lambda i, j, k: (j, 0), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((NT, PT), lambda i, j, k: (j, i), memory_space=pltpu.VMEM)]*2,
        out_shape=[jax.ShapeDtypeStruct((NS_, P_), jnp.float32)]*2)(a1, a2, a3, a4))
    try:
        t0 = time.perf_counter()
        out = f(tau, car, amp, tf)
        s = float(jnp.sum(jnp.abs(out[0][:1, :1])))
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            o = f(tau, car, amp, tf)
            _ = float(jnp.sum(jnp.abs(o[0][:1, :1])))
            ts.append(time.perf_counter() - t1)
        print(f"{name}: OK ({s:.3f}) median {1000*float(np.median(ts)):.1f} ms "
              f"(compile {time.perf_counter()-t0:.0f}s)")
    except Exception as e:
        msg = str(e)
        i = msg.find("failed to legalize")
        print(f"{name}: FAIL {(msg[i:i+80] if i>=0 else msg[:80])!r}".replace(chr(10), ' '))

trial("x64off grid(1,1,1)  ", 32, 16, 256, 32, 16, 256)
trial("x64off grid(4,4,2)  ", 512, 2048, 2048, 128, 1024, 512)
