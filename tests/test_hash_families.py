"""Pins for the r10 oracle-exact hash families.

The DuckDB oracles for q53/q54/q56/q117 are GENERATED from the same
Python constants as the Spark plans, so a formula/seed drift would keep
the oracle green while silently invalidating every STANDING driver row
built on the old family. These pins make such a drift a loud local
failure instead.
"""

from __future__ import annotations

import numpy as np

from pandas_td_spark.operators.dedup import MINHASH_PRIME, minhash_params
from pandas_td_spark.operators.similarity import plane_matrix


def test_minhash_params_bounds_and_pins():
    ps = minhash_params(32, 42)
    assert len(ps) == 32
    for a, b in ps:
        assert 1 <= a <= MINHASH_PRIME - 1
        assert 0 <= b <= MINHASH_PRIME - 1
    assert len(set(ps)) == 32, "mix parameters must be pairwise distinct"
    # pinned values of the certified family (seed 42) — changing the
    # formula or seed invalidates q53's standing driver rows
    assert ps[0] == (43000130, 2122317886)
    assert ps[31] == (43245619, 2125564485)


def test_minhash_affine_mix_is_exact_bigint():
    # largest possible product must stay under 2^63 (both engines exact)
    a_max = MINHASH_PRIME - 1
    h_max = MINHASH_PRIME - 1
    assert a_max * h_max + (MINHASH_PRIME - 1) < 2**63


def test_plane_matrix_pins_and_sharing():
    pm = plane_matrix(64, 4, 8, 7)
    assert pm.shape == (32, 64)
    # pinned corners of the certified Gaussian bank (seed 7): q56's
    # oracle embeds these exact doubles as SQL literals
    assert repr(float(pm[0, 0])) == "0.0012301533574825742"
    assert repr(float(pm[31, 63])) == "-0.5541982062122524"
    # the UDF and expression paths must read the SAME matrix object
    # semantics: regeneration is bit-identical
    assert np.array_equal(pm, plane_matrix(64, 4, 8, 7))
