"""L2 GPC machinery tests: Diophantine identity, prediction consistency
(free + forced response must reproduce an exact model rollout), filter
design, conditioning."""

import numpy as np

from mpc_tuning_tpu.models import lti, plants, simulate
from mpc_tuning_tpu.ops import condmin as cm
from mpc_tuning_tpu.ops import filters as flt
from mpc_tuning_tpu.ops import gpc


def test_diophantine_identity():
    # 1 = E_j * (A Delta) + z^-j F_j must hold exactly for every j
    A = np.array([1.0, -1.2, 0.35])
    N, d = 6, 2
    E, F = gpc.diophantine(A, N, d)
    AD = np.convolve(A, [1.0, -1.0])
    for row in range(N):
        j = d + 1 + row
        Ej = E[row, :j]
        lhs = np.convolve(Ej, AD)
        # add z^-j F_j
        total = np.zeros(max(len(lhs), j + F.shape[1]))
        total[: len(lhs)] += lhs
        total[j : j + F.shape[1]] += F[row]
        expect = np.zeros_like(total)
        expect[0] = 1.0
        np.testing.assert_allclose(total, expect, atol=1e-10)


def test_diophantine_first_order_closed_form():
    # A = [1, -a]: F_j = [(1+a+...+a^j... ) closed form via prediction of
    # y(k+j) for integrator-augmented model. Check j=1 row directly:
    a = 0.9
    E, F = gpc.diophantine(np.array([1.0, -a]), 3, 0)
    # AD = [1, -(1+a), a]; f1 = [1+a, -a]
    np.testing.assert_allclose(F[0], [1 + a, -a], atol=1e-12)
    np.testing.assert_allclose(E[0], [1.0, 0, 0], atol=1e-12)


def _prediction_setup(p, m, round_decimals=4):
    plant = plants.wood_berry()
    Pnz = plant.G.c2d(1.0)  # integer delays [1 2;2 1]
    mats = gpc.build_gpc(
        Pnz, p, m, np.ones(2), np.ones(2), use_dtc=True, round_decimals=round_decimals
    )
    fast = Pnz.fast_model()
    return Pnz, fast, mats


def test_free_plus_forced_matches_rollout():
    """Definitive consistency check of diophantine/MatG/deltaUFree: with an
    exact model and predictor == fast-model output, yf + H dU_future must
    equal the fast model's actual future trajectory."""
    rng = np.random.default_rng(3)
    p = np.array([5, 5])
    m = np.array([3, 3])
    # round_decimals=12 disables the reference's 4-decimal pole rounding so
    # the identity is exact (with 4 it holds to ~1e-5, matching MATLAB)
    Pnz, fast, mats = _prediction_setup(p, m, round_decimals=12)
    fast_ss = fast.to_ss()

    K = 40
    dU = rng.standard_normal((K, 2)) * 0.1
    u = np.cumsum(dU, axis=0)
    y_hist = simulate.dlsim(fast_ss, u)

    k = 25
    # past-control register: newest first per input
    duM = mats.duM
    up = np.zeros(int(duM.sum()))
    off = 0
    for j in range(2):
        for lag in range(int(duM[j])):
            up[off + lag] = dU[k - 1 - lag, j]
        off += int(duM[j])
    # past predictor outputs
    na_w = int(mats.na.max()) + 1
    Yd = np.zeros(2 * (int(mats.na[0]) + 1) if False else int(np.sum(mats.na + 1)))
    pos = 0
    for i in range(2):
        for lag in range(int(mats.na[i]) + 1):
            Yd[pos] = y_hist[k - lag, i]
            pos += 1

    dU_fut = np.zeros((int(p[0]), 2))
    dU_fut[: int(m[0])] = rng.standard_normal((int(m[0]), 2)) * 0.1
    z = np.concatenate([dU_fut[: int(m[0]), 0], dU_fut[: int(m[1]), 1]])

    y_pred = mats.Hp @ up + mats.S @ Yd + mats.H @ z

    # actual rollout
    u_fut = u[k - 1] + np.cumsum(dU_fut, axis=0)
    u_all = np.vstack([u[:k], u_fut])
    y_all = simulate.dlsim(fast_ss, np.vstack([u_all, u_all[-1:]]))
    y_true = np.concatenate(
        [y_all[k + 1 : k + 1 + int(p[0]), 0], y_all[k + 1 : k + 1 + int(p[1]), 1]]
    )
    np.testing.assert_allclose(y_pred, y_true, atol=1e-8)


def test_unconstrained_gain_shapes_and_symmetry():
    p = np.array([3, 3])
    m = np.array([3, 3])
    _, _, mats = _prediction_setup(p, m)
    assert mats.H.shape == (6, 6)
    assert mats.Km.shape == (2, 6)
    np.testing.assert_allclose(mats.Km[0], mats.K[0], atol=0)
    np.testing.assert_allclose(mats.Km[1], mats.K[3], atol=0)


def test_robust_filter_dc_gain_and_cancellation():
    plant = plants.wood_berry()
    Pnz = plant.G.c2d(1.0)
    filters, dmin = flt.mimo_filter(Pnz, 0.7, 0.8)
    np.testing.assert_array_equal(dmin, [1, 1])
    for (Nr, Dr), d in zip(filters, dmin):
        # unit DC gain (mimofilter.m:52-58 validation)
        assert abs(np.sum(Nr) / np.sum(Dr) - 1.0) < 1e-8
        # cancellation: Dr - Nr z^-d divisible by (z-1) and by slow poles
        num = np.zeros(max(len(Dr), len(Nr) + d))
        num[: len(Dr)] += Dr
        num[d : d + len(Nr)] -= Nr
        roots = np.roots(num)
        # contains root at 1
        assert np.min(np.abs(roots - 1.0)) < 1e-6


def test_robust_filter_cancels_model_poles():
    # slow pole 0.95 with delay 2 must be a root of Dr - Nr z^-d
    Nr, Dr = flt.design_robust_filter(np.array([0.95]), 0.7, 2)
    num = np.zeros(max(len(Dr), len(Nr) + 2))
    num[: len(Dr)] += Dr
    num[2 : 2 + len(Nr)] -= Nr
    for target in [1.0, 0.95]:
        val = np.polyval(num[::-1], 1.0 / target) if False else sum(
            c * target ** (-i) for i, c in enumerate(num)
        )
        assert abs(val) < 1e-9


def test_condmin_beats_reference_conditioning():
    # Shell 3x3 DC gains and the reference's committed scale artifacts
    K = plants.shell3x3().G.dcgain()
    L_ref = np.array([0.4358, 0.4206, 0.5933])
    R_ref = np.array([0.6619, 0.2756, 0.4117])
    c_ref = cm.cond_of(K, L_ref, R_ref)
    L, R, S = cm.condmin(K)
    assert S <= c_ref + 1e-6, (S, c_ref)
    # unscaled conditioning should be strictly worse
    assert np.linalg.cond(K) > S


def test_condmin_wood_berry():
    K = plants.wood_berry().G.dcgain()
    L, R, S = cm.condmin(K)
    assert S < np.linalg.cond(K)
    assert S < 6.0  # minimized condition number of WB gains is ~5.87
