"""On-chip isolation of the whole-sim kernel's f-assembly ops.

diag_sim_fused_tpu.py showed the kernel's trajectory deviation jumps
from EXACTLY ZERO to ~1e-2 the step the setpoint activates — a specific
r-path op, not accumulated ulp noise.  This probes each candidate op
COMPILED on-chip (not interpret) against the XLA scan-path equivalent:

  1. r_t = broadcast_to(r_k[None], (p, ny, Bt)).reshape(pny, Bt)
  2. err = q * (r_t - free); f_du = -2 * ThT @ err   (old association)
  3. f_du2 = -2 * sum(QThT * (r_t - free), axis=1)   (scan association)
  4. u_t = broadcast_to(u_prev[None], (4m, nu, Bt)).reshape(...)
  5. hs = (hbase + su*u_t) * ev
"""
import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def main():
    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(1)
    p, ny, Bt = 64, 2, 512
    pny = p * ny
    n_pad, m_max, nu = 24, 8, 2
    mcp = 4 * m_max * nu + 1
    mcp = max(8, -(-mcp // 8) * 8)

    r_k = rng.standard_normal((ny, Bt)).astype(np.float32)
    free = rng.standard_normal((pny, Bt)).astype(np.float32)
    q = np.abs(rng.standard_normal((pny, Bt))).astype(np.float32)
    ThT = rng.standard_normal((n_pad, pny)).astype(np.float32)
    QThT = (ThT[:, None, :] * q.T[None]).astype(np.float32)  # fake per-lane
    # reorder QThT to (n_pad, pny, Bt)
    QThT = np.ascontiguousarray(np.einsum("np,pb->npb", ThT, q),
                                dtype=np.float32)
    u_prev = rng.standard_normal((nu, Bt)).astype(np.float32)
    hbase = rng.standard_normal((mcp, Bt)).astype(np.float32)
    su = rng.standard_normal((mcp, Bt)).astype(np.float32)
    ev = rng.standard_normal((mcp, Bt)).astype(np.float32)

    HIGH = jax.lax.Precision.HIGHEST
    dn = (((1,), (0,)), ((), ()))

    def kern(r_ref, free_ref, q_ref, ThT_ref, QThT_ref, up_ref, hb_ref,
             su_ref, ev_ref, rt_out, f1_out, f2_out, ut_out, hs_out):
        rk = r_ref[...]
        fr = free_ref[...]
        qq = q_ref[...]
        T = ThT_ref[...]
        QT = QThT_ref[...]
        up = up_ref[...]
        r_t = jnp.broadcast_to(rk[None], (p, ny, Bt)).reshape(pny, Bt)
        rt_out[...] = r_t
        err = qq * (r_t - fr)
        f1_out[...] = -2.0 * jax.lax.dot_general(
            T, err, dn, precision=HIGH, preferred_element_type=jnp.float32)
        f2_out[...] = -2.0 * jnp.sum(QT * (r_t - fr)[None, :, :], axis=1)
        u_t = jnp.broadcast_to(up[None], (4 * m_max, nu, Bt)).reshape(
            4 * m_max * nu, Bt)
        u_t = jnp.concatenate(
            [u_t, jnp.zeros((mcp - 4 * m_max * nu, Bt), jnp.float32)],
            axis=0)
        ut_out[...] = u_t
        hs_out[...] = (hb_ref[...] + su_ref[...] * u_t) * ev_ref[...]

    outs = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((pny, Bt), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, Bt), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, Bt), jnp.float32),
                   jax.ShapeDtypeStruct((mcp, Bt), jnp.float32),
                   jax.ShapeDtypeStruct((mcp, Bt), jnp.float32)),
    )(*[jnp.asarray(a) for a in
        (r_k, free, q, ThT, QThT, u_prev, hbase, su, ev)])
    rt_k, f1_k, f2_k, ut_k, hs_k = [np.asarray(o, np.float64) for o in outs]

    # references (f64 on host)
    rt_ref = np.broadcast_to(r_k[None], (p, ny, Bt)).reshape(pny, Bt)
    e64 = rt_ref.astype(np.float64) - free.astype(np.float64)
    f_ref = -2.0 * np.einsum("np,pb->nb", ThT.astype(np.float64),
                             q.astype(np.float64) * e64)
    ut_ref = np.broadcast_to(u_prev[None], (4 * m_max, nu, Bt)).reshape(
        4 * m_max * nu, Bt)
    ut_ref = np.concatenate(
        [ut_ref, np.zeros((mcp - 4 * m_max * nu, Bt))], axis=0)
    hs_ref = (hbase.astype(np.float64) + su.astype(np.float64) * ut_ref) \
        * ev.astype(np.float64)

    rel = lambda a, b: float(
        np.abs(a - b).max() / max(np.abs(b).max(), 1e-30))
    print("r_t broadcast+reshape exact:",
          bool((rt_k == rt_ref.astype(np.float32).astype(np.float64)).all()),
          "rel", rel(rt_k, rt_ref))
    print("f old association   rel_err", rel(f1_k, f_ref))
    print("f scan association  rel_err", rel(f2_k, f_ref))
    print("u_t broadcast exact:",
          bool((ut_k == ut_ref.astype(np.float32).astype(np.float64)).all()))
    print("hs rel_err", rel(hs_k, hs_ref))

    # XLA versions of the same ops for the rounding split
    f_x = jax.jit(lambda T, qq, e: -2.0 * jnp.einsum(
        "np,pb->nb", T, qq * e, precision="highest"))(
        jnp.asarray(ThT), jnp.asarray(q), jnp.asarray(rt_ref - free,
                                                      jnp.float32))
    print("f XLA(old assoc)    rel_err", rel(np.asarray(f_x, np.float64),
                                             f_ref))
    print("kernel-vs-XLA (old) rel   ", rel(f1_k,
                                            np.asarray(f_x, np.float64)))


if __name__ == "__main__":
    main()
