"""Level-pool reservoir kernel tests.

Golden-value parity with the reference's reservoir kernel test
(``troute-network/troute/network/reservoirs/test/test_compute_kernel.py``,
``test_lp_run``): same parameters, same 108-step inflow hydrograph, same
expected final outflow/elevation — exercised through the vectorized JAX op
instead of the Cython->C->Fortran chain.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from troute_tpu.ops.levelpool import LevelpoolParams, levelpool_step
from reference_impl import levelpool_ref

# fixture values from the reference test (lp_reservoir)
LP = dict(
    water_elevation=9.7373, lake_area=15.0949, weir_elevation=9.626,
    weir_coefficient=0.4, weir_length=10.0, dam_length=10.0,
    orifice_elevation=7.733, orifice_coefficient=0.1, orifice_area=1.0,
    max_depth=9.96,
)

# 108-step inflow hydrograph from the reference test fixture
INFLOWS = np.array([
    91.27196, 91.7394, 92.15904, 92.1518, 91.84663, 91.38554, 90.86131,
    90.32736, 89.81273, 89.3325, 88.89427, 88.5025, 88.16228, 87.41539,
    86.80043, 86.03979, 85.3849, 85.33451, 86.84274, 91.6084, 101.81398,
    118.85916, 143.99232, 177.7355, 219.2348, 267.22351, 319.90402, 374.54324,
    428.86066, 480.92096, 529.23584, 572.77673, 610.93237, 643.4389, 670.28516,
    691.67767, 707.96088, 719.57312, 726.96997, 730.63269, 731.03186, 728.61438,
    723.79578, 716.9549, 708.43268, 698.53247, 687.52112, 675.63123, 663.06421,
    649.99976, 636.57898, 622.92926, 609.1745, 595.40369, 581.68799, 568.08588,
    554.64484, 541.4032, 528.39185, 515.63513, 503.14838, 490.95123, 479.05109,
    467.45493, 456.16663, 445.18753, 434.51706, 424.15311, 414.0921, 404.32956,
    394.86014, 385.67789, 376.77621, 368.14966, 359.78958, 351.68875, 343.83972,
    336.23505, 328.86719, 321.7287, 314.81219, 308.11047, 301.61646, 295.32312,
    289.22369, 283.31207, 277.5813, 272.02521, 266.63776, 261.41315, 256.34564,
    251.42978, 246.66023, 242.03192, 237.53989, 233.17944, 228.94595, 224.83511,
    220.84265, 216.96449, 213.19672, 209.53554, 205.97734, 202.51857, 199.1559,
    195.88605, 192.70595, 189.61255,
], dtype=np.float64)

EXPECTED_FINAL_OUTFLOW = 17.0437641
EXPECTED_FINAL_ELEVATION = 10.4923334
ROUTING_PERIOD = 300.0


def _params(n=1, dtype=jnp.float32):
    full = lambda v: jnp.full((n,), v, dtype)
    return LevelpoolParams(
        area=full(LP["lake_area"]), max_depth=full(LP["max_depth"]),
        orifice_area=full(LP["orifice_area"]),
        orifice_coeff=full(LP["orifice_coefficient"]),
        orifice_elev=full(LP["orifice_elevation"]),
        weir_coeff=full(LP["weir_coefficient"]),
        weir_elev=full(LP["weir_elevation"]),
        weir_length=full(LP["weir_length"]),
        dam_length=full(LP["dam_length"]),
    )


def test_lp_golden_run():
    """Drive the reference hydrograph through the vector op; final state
    must match the reference's golden values (f32 chain, rel ~1e-4)."""
    p = _params(1, jnp.float32)
    step = jax.jit(levelpool_step)
    H = jnp.asarray([LP["water_elevation"]], jnp.float32)
    out = None
    # the reference C binding passes previous_timestep_inflow = inflow
    # (bind_lp.f90:71-72), so qi0 == qi1 in the routing chain
    for q in INFLOWS:
        qi1 = jnp.full((1,), q, jnp.float32)
        out, H = step(H, qi1, qi1, jnp.zeros(1, jnp.float32), ROUTING_PERIOD, p)
    assert float(out[0]) == pytest.approx(EXPECTED_FINAL_OUTFLOW, rel=1e-4)
    assert float(H[0]) == pytest.approx(EXPECTED_FINAL_ELEVATION, rel=1e-5)


def test_lp_vs_oracle_trajectory():
    """Every step of the trajectory matches the scalar oracle in f64."""
    p = _params(1, jnp.float64)
    step = jax.jit(levelpool_step)
    H = jnp.asarray([LP["water_elevation"]], jnp.float64)
    H_ref = LP["water_elevation"]
    for q in INFLOWS:
        out, H = step(H, jnp.asarray([float(q)]), jnp.asarray([float(q)]),
                      jnp.zeros(1), ROUTING_PERIOD, p)
        out_ref, H_ref = levelpool_ref(
            H_ref, float(q), float(q), 0.0, ROUTING_PERIOD,
            LP["lake_area"], LP["weir_elevation"], LP["max_depth"],
            LP["weir_coefficient"], LP["weir_length"], LP["dam_length"],
            LP["orifice_elevation"], LP["orifice_coefficient"],
            LP["orifice_area"])
        assert float(out[0]) == pytest.approx(out_ref, rel=1e-12, abs=1e-12)
        assert float(H[0]) == pytest.approx(H_ref, rel=1e-12)


def test_lp_batch_consistency():
    """A batch of identical reservoirs evolves identically to a single one."""
    n = 16
    p = _params(n, jnp.float32)
    H = jnp.full((n,), LP["water_elevation"], jnp.float32)
    qi0 = jnp.zeros(n, jnp.float32)
    qi1 = jnp.full((n,), 91.27196, jnp.float32)
    out, H2 = jax.jit(levelpool_step)(H, qi0, qi1, jnp.zeros(n, jnp.float32),
                                      ROUTING_PERIOD, p)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out)[0])
    np.testing.assert_array_equal(np.asarray(H2), np.asarray(H2)[0])
