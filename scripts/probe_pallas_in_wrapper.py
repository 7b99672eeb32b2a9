import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np, math
from nis_sar_amtigmti_video_tpu.ops.pallas.echo_kernel import echo_accumulate
rng = np.random.default_rng(0)
P, B, Ns = 32, 16, 256
tau = jnp.asarray(rng.uniform(0.2e-6, 1e-6, (P,B)).astype(np.float32))
car = jnp.asarray(rng.uniform(-np.pi, np.pi, (P,B)).astype(np.float32))
amp = jnp.asarray(rng.uniform(0.5, 2.0, (P,B)).astype(np.float32))
tf = jnp.asarray((np.arange(Ns)/60e6).astype(np.float32))
for name, kw in (("multi-grid", dict(pulse_tile=16, ns_tile=64, target_tile=8)),
                 ("default",   dict())):
    try:
        out = echo_accumulate(tau, car, amp, tf, k_pi=math.pi*150e6/2e-6,
                              shift=1e-6, half=1e-6, **kw)
        print("ECHO", name, "OK:", float(jnp.sum(jnp.abs(out))), flush=True)
    except Exception as e:
        msg = str(e); i = msg.find("Mosaic failed")
        print("ECHO", name, "FAILED:", (msg[i:i+150] if i>=0 else msg[:150]).replace('\n',' '), flush=True)
