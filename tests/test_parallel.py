"""Mesh/sharding tests on the virtual 8-device CPU mesh, incl. the graft
entry points."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.slow  # compile-heavy; run with -m slow or no -m filter



def test_mesh_creation():
    from realcamnet_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["spatial"] == 1
    mesh2 = create_mesh(spatial=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["spatial"] == 2


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 128, 128, 3)


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
