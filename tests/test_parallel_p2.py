"""P2 multi-device execution: the flat element-operator path under GSPMD.

SURVEY.md lists 'halo exchange for P2 DoFs' among the hard parts. The flat
path sidesteps explicit halos entirely: the DoF vector is 1D-sharded and
the XLA SPMD partitioner inserts the collectives for the gather /
segment_sum pipeline. Note: NamedSharding requires the (odd) P2 DoF count
to divide over the shard count, so shard counts here are odd divisors;
the production spatially-blocked P2 layout is future work.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpuwave.models.discretization import Discretization
from tpuwave.models.newmark import NewmarkSolver
from tpuwave.models.theta import ThetaSolver
from tpuwave.models.theta import ThetaState
from tpuwave.models.newmark import NewmarkState
from tpuwave.parallel.sharding import device_mesh
from tpuwave.utils.params import load_params

from tests.test_schemes import standing_mode


def test_p2_theta_sharded_matches_single():
    p = load_params(standing_mode(Nel="12", R="2", T="0.05", Dt="0.01"))
    d = Discretization(p)
    s = ThetaSolver(d)
    assert d.n_dofs == 625  # (2*12+1)^2, divisible by 5
    mesh = device_mesh(5)
    sh = NamedSharding(mesh, P("y"))
    step_sharded = jax.jit(s._step_impl,
                           in_shardings=(ThetaState(u=sh, v=sh), None),
                           out_shardings=(ThetaState(u=sh, v=sh), None))
    st_s = st_r = s.initial_state()
    t = 0.0
    for _ in range(3):
        t += p.dt
        st_s, info = step_sharded(st_s, t)
        st_r, _ = s.step(st_r, t)
    assert len(st_s.u.sharding.device_set) == 5
    np.testing.assert_allclose(np.asarray(st_s.u), np.asarray(st_r.u),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_s.v), np.asarray(st_r.v),
                               rtol=1e-10, atol=1e-12)


def test_p2_newmark_sharded_matches_single():
    p = load_params(standing_mode(Nel="12", R="2", T="0.03", Dt="0.01"))
    d = Discretization(p)
    s = NewmarkSolver(d)
    mesh = device_mesh(5)
    sh = NamedSharding(mesh, P("y"))
    spec = NewmarkState(u=sh, v=sh, a=sh)
    step_sharded = jax.jit(s._step_impl, in_shardings=(spec, None),
                           out_shardings=(spec, None))
    st_s = st_r = s.initial_state()
    t = 0.0
    for _ in range(3):
        t += p.dt
        st_s, _ = step_sharded(st_s, t)
        st_r, _ = s.step(st_r, t)
    assert len(st_s.u.sharding.device_set) == 5
    np.testing.assert_allclose(np.asarray(st_s.u), np.asarray(st_r.u),
                               rtol=1e-10, atol=1e-12)
