import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial

P_, B_, NS_ = 32, 16, 256
PT, NT, TB = 32, 64, 16

def make(body_kind):
    def kern(tau_ref, car_ref, amp_ref, tf_ref, o1_ref, o2_ref):
        k = pl.program_id(2)
        @pl.when(k == 0)
        def _():
            o1_ref[:] = jnp.zeros_like(o1_ref)
            o2_ref[:] = jnp.zeros_like(o2_ref)
        t = tf_ref[:]
        def body(b, c):
            tau_b = tau_ref[pl.ds(b, 1), :]
            car_b = car_ref[pl.ds(b, 1), :]
            amp_b = amp_ref[pl.ds(b, 1), :]
            if body_kind == 'a':
                o1_ref[:] = o1_ref[:] + (t - tau_b)
                o2_ref[:] = o2_ref[:] + amp_b + 0.0*car_b
            elif body_kind == 'b':
                arg = (t - tau_b) - 1e-6
                gate = jnp.abs(arg) <= 1e-6
                a = jnp.where(gate, amp_b, 0.0)
                o1_ref[:] = o1_ref[:] + a * arg
                o2_ref[:] = o2_ref[:] + a + 0.0*car_b
            else:
                arg = (t - tau_b) - 1e-6
                gate = jnp.abs(arg) <= 1e-6
                phase = car_b + 2.356e14 * (arg * arg)
                a = jnp.where(gate, amp_b, 0.0)
                o1_ref[:] = o1_ref[:] + a * jnp.cos(phase)
                o2_ref[:] = o2_ref[:] + a * jnp.sin(phase)
            return c
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(TB), body, jnp.int32(0))
    return kern

rng = np.random.default_rng(0)
tau_t = jnp.asarray(rng.uniform(0.2e-6, 1e-6, (B_, P_)).astype(np.float32))
car_t = jnp.asarray(rng.uniform(-3, 3, (B_, P_)).astype(np.float32))
amp_t = jnp.asarray(rng.uniform(0.5, 2, (B_, P_)).astype(np.float32))
tf = jnp.broadcast_to(jnp.asarray((np.arange(NS_)/60e6).astype(np.float32))[:, None], (NS_, PT))

for kind in ('a', 'b', 'c'):
    f = jax.jit(lambda a1, a2, a3, a4, kind=kind: pl.pallas_call(
        make(kind),
        grid=(P_//PT, NS_//NT, B_//TB),
        in_specs=[pl.BlockSpec((TB, PT), lambda i, j, k: (k, i), memory_space=pltpu.VMEM)]*3 +
                 [pl.BlockSpec((NT, PT), lambda i, j, k: (j, 0), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((NT, PT), lambda i, j, k: (j, i), memory_space=pltpu.VMEM)]*2,
        out_shape=[jax.ShapeDtypeStruct((NS_, P_), jnp.float32)]*2)(a1, a2, a3, a4))
    try:
        o1, o2 = f(tau_t, car_t, amp_t, tf)
        print("VARIANT", kind, "OK", float(jnp.sum(o1)), float(jnp.sum(o2)), flush=True)
    except Exception as e:
        msg = str(e); i = msg.find("Mosaic failed")
        print("VARIANT", kind, "FAILED:", (msg[i:i+160] if i>=0 else msg[:160]).replace('\n',' '), flush=True)
