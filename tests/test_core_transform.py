import jax.numpy as jnp
import numpy as np
import pytest

from beifong_tpu.core import transform as tf


def test_translate_scale_compose():
    m = tf.compose(tf.translate([1, 2, 3]), tf.scale(2.0))
    p = tf.apply_point(m, jnp.array([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(p), [3, 4, 5], atol=1e-6)
    v = tf.apply_vector(m, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [2, 0, 0], atol=1e-6)


def test_rotate():
    m = tf.rotate([0, 0, 1], 90.0)
    p = tf.apply_point(m, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(p), [0, 1, 0], atol=1e-6)


def test_look_at_maps_z_to_view():
    m = tf.look_at([0, 0, 0], [0, -1, 0], [0, 0, 1])
    d = tf.apply_vector(m, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(d), [0, -1, 0], atol=1e-6)
    # Orthonormal rotation part
    r = np.asarray(m)[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_normal_transform():
    m = tf.scale([2.0, 1.0, 1.0])
    mi = tf.inverse(m)
    n = tf.apply_normal(mi, jnp.array([1.0, 0.0, 0.0]))
    # Normal of plane x=0 under x-stretch stays x-direction but scales by 1/2
    np.testing.assert_allclose(np.asarray(n), [0.5, 0, 0], atol=1e-6)


def test_frame_roundtrip():
    n = jnp.array([[0.0, 0.0, 1.0], [0.6, 0.0, 0.8], [0.0, -1.0, 0.0]])
    f = tf.frame_from_normal(n)
    # Orthonormality
    ff = np.asarray(f)
    for i in range(n.shape[0]):
        np.testing.assert_allclose(ff[i] @ ff[i].T, np.eye(3), atol=1e-5)
    v = jnp.array([0.3, -0.2, 0.9])
    loc = tf.to_local(f, jnp.broadcast_to(v, n.shape))
    back = tf.to_world(f, loc)
    np.testing.assert_allclose(np.asarray(back),
                               np.broadcast_to(np.asarray(v), n.shape), atol=1e-5)
    # cos_theta of the normal itself in its own frame = 1
    nn = tf.to_local(f, n)
    np.testing.assert_allclose(np.asarray(tf.cos_theta(nn)), 1.0, atol=1e-5)


def test_band_config():
    from beifong_tpu.core.config import Band, band_preset
    b = Band.from_freq(340.0, 40e3, 10e3)
    assert b.freq_centre == pytest.approx(40e3, rel=1e-2)
    assert b.freq_min == pytest.approx(35e3, rel=1e-6)
    assert b.freq_max == pytest.approx(45e3, rel=1e-6)
    assert band_preset("mmw_94g").c == pytest.approx(299792458.0)


def test_distr_discrete():
    import jax
    from beifong_tpu.core.distr import DiscreteDistribution
    d = DiscreteDistribution.build(jnp.array([1.0, 2.0, 3.0, 4.0]))
    u = jax.random.uniform(jax.random.key(0), (100_000,))
    idx = np.asarray(d.sample(u))
    freq = np.bincount(idx, minlength=4) / idx.size
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=5e-3)


def test_distr_continuous():
    import jax
    from beifong_tpu.core.distr import ContinuousDistribution
    # Linear ramp pdf on [0, 2]
    xs = jnp.linspace(0.0, 1.0, 17)
    d = ContinuousDistribution.build(0.0, 2.0, xs)
    u = jax.random.uniform(jax.random.key(1), (200_000,))
    x = np.asarray(d.sample(u))
    assert (x >= 0).all() and (x <= 2).all()
    # E[x] for pdf ~ x on [0,2] is 4/3
    assert x.mean() == pytest.approx(4 / 3, abs=5e-3)


def test_sample_stream_deterministic_and_uniform():
    import jax
    from beifong_tpu.core.rng import SampleStream
    s = SampleStream.make(jax.random.key(0), 4096, 0)
    u1, s2 = s.next_1d()
    u1b, _ = s.next_1d()
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u1b))
    u2, s3 = s2.next_2d()
    assert u2.shape == (4096, 2)
    # Streams differ between dims and lanes
    assert not np.allclose(np.asarray(u1), np.asarray(u2[:, 0]))
    assert np.asarray(u1).std() == pytest.approx(1 / np.sqrt(12), abs=0.01)


def test_halton():
    from beifong_tpu.core.rng import halton
    pts = np.asarray(halton(jnp.arange(1, 9), 2))
    # First Halton points base 2: 1/2, 1/4, 3/4, ...
    np.testing.assert_allclose(pts[:3, 0], [0.5, 0.25, 0.75], atol=1e-6)
    np.testing.assert_allclose(pts[:3, 1], [1 / 3, 2 / 3, 1 / 9], atol=1e-6)


def test_animated_transform_keyframes():
    """AnimatedTransform (reference core/transform.h AnimatedTransform):
    exact at keyframes, slerp midpoint rotation, derivative velocity."""
    import numpy as np
    from beifong_tpu.core import transform as tf
    from beifong_tpu.core.transform import AnimatedTransform
    m0 = np.asarray(tf.compose(tf.look_at([0, -4, 0], [0, 0, 0]),
                               tf.scale(0.3)))
    m1 = np.asarray(tf.compose(tf.look_at([0, -3, 0], [0, 0, 0]),
                               tf.scale(0.3)))
    a = AnimatedTransform.from_keyframes([(0.0, m0), (1.0, m1)])
    np.testing.assert_allclose(a.eval(0.0), m0, atol=1e-6)
    np.testing.assert_allclose(a.eval(1.0), m1, atol=1e-6)
    np.testing.assert_allclose(a.eval(0.5)[:3, 3], [0, -3.5, 0], atol=1e-6)
    # clamped outside the keyframe span
    np.testing.assert_allclose(a.eval(-1.0), m0, atol=1e-6)
    # translational velocity: 1 m/s toward +y
    np.testing.assert_allclose(a.velocity(0.5), [0, 1, 0], atol=2e-3)
    # pure rotation: slerp midpoint is the half-angle rotation and the rim
    # speed of a lever arm is omega * r
    b = AnimatedTransform.from_keyframes([
        (0.0, np.asarray(tf.rotate([0, 0, 1], 0.0))),
        (1.0, np.asarray(tf.rotate([0, 0, 1], 90.0)))])
    np.testing.assert_allclose(b.eval(0.5)[:3, :3],
                               np.asarray(tf.rotate([0, 0, 1], 45.0))[:3, :3],
                               atol=1e-6)
    v = b.velocity(0.5, (1.0, 0.0, 0.0))
    assert np.linalg.norm(v) == pytest.approx(np.pi / 2, rel=1e-3)


def test_scene_at_time_snapshot():
    """Scene.at_time evaluates animated shapes and fills velocities,
    including the attached endpoint's velocity."""
    import numpy as np
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tf
    from beifong_tpu.core.config import Band
    from beifong_tpu.core.transform import AnimatedTransform
    from beifong_tpu.radar import cw, wigner_transmitter

    s = sc.Scene(band=Band.from_freq(340.0, 40e3, 10e3))
    s.add(diffuse("m", reflectance=1.0))
    s.add(wigner_transmitter("tx", cw(f_centre=40e3), resample_freq=True))
    txs = sh.rectangle(transmitter="tx")
    txs.to_world = AnimatedTransform.from_keyframes([
        (0.0, np.asarray(tf.look_at([0, 0, 0], [0, -1, 0]))),
        (1.0, np.asarray(tf.look_at([2, 0, 0], [2, -1, 0])))])
    s.add(txs)
    tgt = sh.rectangle(to_world=np.asarray(
        tf.look_at([0, -4, 0], [0, 0, 0])), bsdf="m")
    s.add(tgt)
    snap = s.at_time(0.25)
    np.testing.assert_allclose(snap.shapes[0].to_world[:3, 3],
                               [0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(snap.shapes[0].velocity, [2, 0, 0], atol=5e-3)
    # the attached transmitter inherits the carrying shape's velocity
    np.testing.assert_allclose(snap.transmitters[0].velocity, [2, 0, 0],
                               atol=5e-3)
    # static shapes untouched; original scene unmodified
    np.testing.assert_allclose(snap.shapes[1].velocity, [0, 0, 0])
    from beifong_tpu.core.transform import AnimatedTransform as AT
    assert isinstance(s.shapes[0].to_world, AT)
    sd = snap.compile()   # compiles cleanly
    assert sd.shapes.kind.shape[0] == 2
