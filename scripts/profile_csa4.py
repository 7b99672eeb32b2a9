"""Wave 4: transposed-chain all-MXU CSA vs hybrid, batch 4, 4096^2."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

def main():
    import jax, jax.numpy as jnp
    from nis_sar_amtigmti_video_tpu import config as cfg
    from nis_sar_amtigmti_video_tpu.ops import csa as csa_ops

    size, batch = 4096, 4
    sc = cfg.videosar(); g, r = sc.geometry, sc.radar
    t0 = 2.0*g.slant_range_m/299792458.0 - sc.collect.window_length_s/2
    p = csa_ops.CsaParams(wavelength_m=r.wavelength_m, chirp_rate=r.chirp_rate,
        fs_hz=r.fs_hz, prf_hz=r.prf_hz, velocity_mps=g.effective_velocity_mps,
        range_ref_m=g.slant_range_m, t_start_fast=t0, num_pulses=size, num_samples=size)
    factors = csa_ops.csa_factors(p)

    @jax.jit
    def mk(key):
        return jax.lax.complex(
            jax.random.normal(key, (batch, size, size), jnp.float32),
            jax.random.normal(jax.random.fold_in(key, 1), (batch, size, size), jnp.float32))
    x = mk(jax.random.PRNGKey(0))

    def variant(name, body, iters=12):
        @jax.jit
        def once(v, f):
            y = body(v, f)
            return y, jnp.sum(jnp.abs(y[..., :1, :1])).astype(jnp.float32)
        try:
            y, s = once(x, factors); _ = float(s)
            t1 = time.perf_counter(); z = y
            for _ in range(iters):
                z, s = once(z, factors)
            _ = float(s)
            dt = (time.perf_counter()-t1)/(iters*batch)
            print(f"{name:26s}: {dt*1e3:7.3f} ms/frame -> {1e3/(dt*1e3):6.1f} fps", flush=True)
        except Exception as e:
            print(f"{name:26s}: FAILED {type(e).__name__} {str(e)[:70]}", flush=True)

    variant("fused hybrid (ref)", lambda v, f: csa_ops.apply_csa_fused(v, f, "hybrid"))
    variant("fused transposed-chain", lambda v, f: csa_ops.apply_csa_fused_t(v, f))

if __name__ == "__main__":
    main()
