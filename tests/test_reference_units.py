"""Equivalents of the reference's own (two) real unit tests, plus the test
matrix its placeholders only sketched (reference tests/unit/test_metric.py:
test_default_error_vector :30-49, test_default_euclidean_distance :52-70,
placeholders :73-198)."""
import numpy as np
import jax.numpy as jnp
import pytest

from open_pcc_metric_tpu.metric import (
    ErrorVector,
    EuclideanDistance,
    GeoMSE,
    GeoPSNR,
    NeighbourDistances,
    PrimaryErrorVector,
    CloudNormals,
)


def _primary_error_vector(values, is_left=True):
    m = PrimaryErrorVector(is_left=is_left)
    m.value = jnp.asarray(values, dtype=jnp.float64)
    return m


class TestErrorVector:
    def test_unit_error_vectors_have_sqrt3_norm(self):
        # All-ones error vectors -> per-point L2 norm sqrt(3)
        # (the reference's only real assertion).
        pev = _primary_error_vector(np.ones((7, 3)))
        m = ErrorVector(is_left=True, point_to_plane=False)
        m.calculate(primary_error_vector=pev)
        np.testing.assert_allclose(
            np.asarray(m.value), np.sqrt(3.0), rtol=1e-12
        )

    def test_point_to_plane_projects_onto_normals(self):
        # The part the reference stubbed out ("how to setup normals?"):
        # error (1,1,1) onto normal (0,0,1) -> 1; onto (1,0,0) -> 1;
        # onto normalized (1,1,1) -> sqrt(3).
        err = np.ones((3, 3))
        normals = np.array(
            [[0.0, 0.0, 1.0], [1.0, 0.0, 0.0],
             [1 / np.sqrt(3)] * 3]
        )
        pev = _primary_error_vector(err)
        nrm = CloudNormals(is_left=False)
        nrm.value = jnp.asarray(normals, dtype=jnp.float64)
        m = ErrorVector(is_left=True, point_to_plane=True)
        m.calculate(primary_error_vector=pev, cloud_normals=nrm)
        np.testing.assert_allclose(
            np.asarray(m.value), [1.0, 1.0, np.sqrt(3.0)], rtol=1e-12
        )


class TestEuclideanDistance:
    @pytest.mark.parametrize("is_left", [True, False])
    def test_p2point_passthrough_of_squared_distances(self, is_left):
        nd = NeighbourDistances(is_left=is_left)
        nd.value = jnp.asarray([4.0, 9.0, 16.0])
        m = EuclideanDistance(is_left=is_left, point_to_plane=False)
        m.calculate(neighbour_distances=nd)
        np.testing.assert_array_equal(np.asarray(m.value), [4.0, 9.0, 16.0])

    def test_p2plane_squares_projection(self):
        ev = ErrorVector(is_left=True, point_to_plane=True)
        ev.value = jnp.asarray([-2.0, 3.0])
        m = EuclideanDistance(is_left=True, point_to_plane=True)
        m.calculate(error_vector=ev)
        np.testing.assert_array_equal(np.asarray(m.value), [4.0, 9.0])


class TestGeoChain:
    def test_mse_then_psnr(self):
        ed = EuclideanDistance(is_left=True, point_to_plane=False)
        ed.value = jnp.asarray([1.0, 2.0, 3.0, 6.0])
        mse = GeoMSE(is_left=True, point_to_plane=False)
        mse.calculate(euclidean_distance=ed)
        assert mse.value == 3.0

        class _Extent:
            value = np.array([10.0, 4.0, 2.0])

        psnr = GeoPSNR(is_left=True, point_to_plane=False)
        psnr.calculate(cloud_extent=_Extent(), geo_mse=mse)
        np.testing.assert_allclose(
            psnr.value, 10 * np.log10(100.0 / 3.0), rtol=1e-12
        )
