"""Independent brute-force cross-check of the guess-height search.

The engine (ops/maps2d.guess_height_delta) and the oracle
(oracle.numpy_ref._guess_height) share nothing with the literal re-derivation
below, which was written directly from the reference's loop structure
(gvom.py:556-661): per work cell, march rings i=1..R; each of the four wedge
scans tests a fixed dy/dx window in ascending order and latches its first
known height; the loop-exit condition omits x_p_done (gvom.py:581) and the
y_n merge is guarded by x_n's sentinel (gvom.py:655). Fuzzing random
height-map patterns at 16×16 pins all three implementations against each
other — this is the VERDICT r3 ask #7 hardening of the parity tree's root.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gvom_tpu.config import GvomConfig
from gvom_tpu.ops import maps2d
from gvom_tpu.oracle.numpy_ref import NumpyOracle
from gvom_tpu.types import UNKNOWN_HEIGHT

pytestmark = pytest.mark.quick

UH = UNKNOWN_HEIGHT


def brute_guess_height(X, R, hm, ihm):
    """Literal transcription of gvom.py:556-661 (see module docstring)."""
    out = np.zeros((X, X), np.float64)
    for x0 in range(X):
        for y0 in range(X):
            if hm[x0, y0] > UH or ihm[x0, y0] == UH:
                continue
            done = dict(xp=False, xn=False, yp=False, yn=False)
            hval = dict(xp=UH, xn=UH, yp=UH, yn=UH)
            i = 0
            while i < R and not (done["xn"] and done["yp"] and done["yn"]):
                i += 1
                if not done["xp"]:
                    if x0 + i < X:
                        for dy in range(-i, i):            # [-i, i)  (gvom.py:590)
                            y = y0 + dy
                            if 0 <= y < X and hm[x0 + i, y] > UH:
                                hval["xp"] = hm[x0 + i, y]
                                done["xp"] = True
                                break
                    else:
                        done["xp"] = True
                if not done["xn"]:
                    if x0 - i >= 0:
                        for dy in range(-i + 1, i + 1):    # (-i, i]  (gvom.py:603)
                            y = y0 + dy
                            if 0 <= y < X and hm[x0 - i, y] > UH:
                                hval["xn"] = hm[x0 - i, y]
                                done["xn"] = True
                                break
                    else:
                        done["xn"] = True
                if not done["yp"]:
                    if y0 + i < X:
                        for dx in range(-i + 1, i + 1):
                            x = x0 + dx
                            if 0 <= x < X and hm[x, y0 + i] > UH:
                                hval["yp"] = hm[x, y0 + i]
                                done["yp"] = True
                                break
                    else:
                        done["yp"] = True
                if not done["yn"]:
                    if y0 - i >= 0:
                        for dx in range(-i, i):
                            x = x0 + dx
                            if 0 <= x < X and hm[x, y0 - i] > UH:
                                hval["yn"] = hm[x, y0 - i]
                                done["yn"] = True
                                break
                    else:
                        done["yn"] = True
            mn, mx = 1000.0, ihm[x0, y0]
            for d, guard in (("xp", "xp"), ("xn", "xn"), ("yp", "yp"), ("yn", "xn")):
                if hval[guard] > UH:                       # y_n guard quirk (G:655)
                    mn = min(hval[d], mn)
                    mx = max(hval[d], mx)
            dh = mx - mn
            if dh > 0:
                out[x0, y0] = dh
    return out


def fuzz_case(seed, X=16, known_frac=0.3, inferred_frac=0.6):
    rng = np.random.default_rng(seed)
    hm = np.full((X, X), UH, np.float32)
    known = rng.random((X, X)) < known_frac
    hm[known] = rng.normal(0.0, 2.0, known.sum()).astype(np.float32)
    ihm = np.full((X, X), UH, np.float32)
    inf = rng.random((X, X)) < inferred_frac
    ihm[inf] = rng.normal(0.5, 2.0, inf.sum()).astype(np.float32)
    return hm, ihm


@pytest.mark.parametrize("seed", range(12))
def test_engine_oracle_brute_agree(seed):
    X, R = 16, 5
    cfg = GvomConfig(xy_size=X, z_size=8, max_points=64, guess_search_radius=R)
    hm, ihm = fuzz_case(seed, X)
    ref = brute_guess_height(X, R, hm, ihm)
    eng = np.asarray(jax.jit(
        lambda h, i: maps2d.guess_height_delta(cfg, h, i)
    )(jnp.asarray(hm), jnp.asarray(ihm)))
    orc = NumpyOracle(cfg)._guess_height(hm.astype(np.float64), ihm.astype(np.float64))
    np.testing.assert_allclose(eng, ref, atol=1e-5)
    np.testing.assert_allclose(orc, ref, atol=1e-5)


def test_sparse_and_dense_extremes():
    X, R = 16, 15                                   # full reference radius
    cfg = GvomConfig(xy_size=X, z_size=8, max_points=64, guess_search_radius=R)
    for hm, ihm in [
        fuzz_case(99, X, known_frac=0.02, inferred_frac=0.9),   # nearly empty
        fuzz_case(100, X, known_frac=0.95, inferred_frac=0.9),  # nearly full
    ]:
        ref = brute_guess_height(X, R, hm, ihm)
        eng = np.asarray(jax.jit(
            lambda h, i: maps2d.guess_height_delta(cfg, h, i)
        )(jnp.asarray(hm), jnp.asarray(ihm)))
        np.testing.assert_allclose(eng, ref, atol=1e-5)
