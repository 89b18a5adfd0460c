"""Scene schema + compiler unit tests."""

import jax.numpy as jnp
import numpy as np

from quadray_tpu.scene import schema as S
from quadray_tpu.scene.compile import compile_scene, transform_matrix


def test_transform_matrix_identity():
    m = np.asarray(transform_matrix(S.Transform3D()))
    np.testing.assert_allclose(m, np.eye(4), atol=1e-6)


def test_transform_matrix_composition():
    t = S.Transform3D(scl=(2.0, 3.0, 4.0), rot=(90.0, 0.0, 0.0),
                      pos=(1.0, 2.0, 3.0))
    m = np.asarray(transform_matrix(t))
    # local +Y scaled by 3 then rotated 90 deg about X -> world +Z*3
    v = m @ np.array([0.0, 1.0, 0.0, 1.0])
    np.testing.assert_allclose(v[:3], [1.0, 2.0, 6.0], atol=1e-5)


def test_compile_minimal_scene():
    scene = S.SceneDef(root=S.Array(objects=[
        S.obj(S.Sphere(rad=2.0), pos=(0.0, 0.0, 5.0)),
        S.obj(S.Camera()),
        S.obj(S.Light(), pos=(1.0, 1.0, 1.0)),
    ]))
    sc = compile_scene(scene)
    assert sc.s_tag.shape[0] >= 1
    i = 0
    np.testing.assert_allclose(np.asarray(sc.s_sci[i]), [1, 1, 1])
    np.testing.assert_allclose(float(sc.s_sciw[i]), 4.0)
    np.testing.assert_allclose(np.asarray(sc.s_pos[i]), [0, 0, 5])
    # light attenuation constant gets the reference's +1 bias
    np.testing.assert_allclose(float(sc.l_cnt[0]), 2.0)


def test_quadric_coeffs_all_tags():
    from quadray_tpu.scene.compile import quadric_coeffs
    for ctor, checks in [
        (S.Cylinder(rad=3.0), dict(sciw=9.0)),
        (S.Cone(rat=2.0), dict(sci_k=-4.0)),
        (S.Paraboloid(par=4.0), dict(scjh_k=2.0)),
        (S.Hyperboloid(rat=2.0, hyp=-0.5), dict(sci_k=-4.0, sciw=-0.5)),
        (S.ParaCylinder(par=2.0), dict(scjh_k=1.0)),
        (S.HyperCylinder(rat=1.0, hyp=0.25), dict(sciw=0.25)),
        (S.HyperParaboloid(pr1=2.0, pr2=4.0), dict(sci_i=0.5, sci_j=-0.25)),
    ]:
        sci, scjh, sciw = quadric_coeffs(ctor)
        sci, scjh = np.asarray(sci), np.asarray(scjh)
        if "sciw" in checks:
            np.testing.assert_allclose(float(sciw), checks["sciw"])
        if "sci_k" in checks:
            np.testing.assert_allclose(sci[2], checks["sci_k"])
        if "sci_i" in checks:
            np.testing.assert_allclose(sci[0], checks["sci_i"])
        if "sci_j" in checks:
            np.testing.assert_allclose(sci[1], checks["sci_j"])
        if "scjh_k" in checks:
            np.testing.assert_allclose(scjh[2], checks["scjh_k"])
