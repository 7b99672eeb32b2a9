import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np, math
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from nis_sar_amtigmti_video_tpu.ops.pallas.echo_kernel import echo_kernel_body

P_, B_, NS_ = 32, 16, 256
PT, NT, TB = 32, 256, 16
rng = np.random.default_rng(0)
tau = jnp.asarray(rng.uniform(0.2e-6, 1e-6, (P_, B_)).astype(np.float32))
car = jnp.asarray(rng.uniform(-3, 3, (P_, B_)).astype(np.float32))
amp = jnp.asarray(rng.uniform(0.5, 2, (P_, B_)).astype(np.float32))
tfv = jnp.asarray((np.arange(NS_)/60e6).astype(np.float32))

kern = partial(echo_kernel_body, k_pi=math.pi*150e6/2e-6, shift=1e-6, half=1e-6,
               target_tile=TB)

def core(a1, a2, a3, a4):
    return pl.pallas_call(kern,
        grid=(P_//PT, NS_//NT, B_//TB),
        in_specs=[pl.BlockSpec((TB, PT), lambda i, j, k: (k, i), memory_space=pltpu.VMEM)]*3 +
                 [pl.BlockSpec((NT, PT), lambda i, j, k: (j, 0), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((NT, PT), lambda i, j, k: (j, i), memory_space=pltpu.VMEM)]*2,
        out_shape=[jax.ShapeDtypeStruct((NS_, P_), jnp.float32)]*2)(a1, a2, a3, a4)

@jax.jit
def with_wrapper(tau, car, amp, tfv):
    # the real wrapper's pre/post ops in the same jit module
    tau_t = jnp.swapaxes(tau, 0, 1)
    car_t = jnp.swapaxes(car, 0, 1)
    amp_t = jnp.swapaxes(amp, 0, 1)
    tf = jnp.broadcast_to(tfv[:, None], (NS_, PT))
    re_t, im_t = core(tau_t, car_t, amp_t, tf)
    raw = jax.lax.complex(jnp.swapaxes(re_t, 0, 1), jnp.swapaxes(im_t, 0, 1))
    return raw[:P_, :NS_]

try:
    out = with_wrapper(tau, car, amp, tfv)
    print("PROBE8 wrapper OK:", float(jnp.sum(jnp.abs(out))))
except Exception as e:
    msg = str(e); i = msg.find("Mosaic failed")
    print("PROBE8 wrapper FAILED:", (msg[i:i+160] if i>=0 else msg[:160]).replace('\n',' '))
