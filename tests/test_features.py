"""Feature layer: ORB extraction, BoW vocabulary, matcher geometry."""

import numpy as np
import pytest
import cv2

from cvo_slam_tpu.config import CameraConfig, SlamConfig
from cvo_slam_tpu.features import bow
from cvo_slam_tpu.features.orb import OrbExtractor, OrbParams
from cvo_slam_tpu.features.matcher import (Matcher, kabsch, match_bow,
                                           optimize_relative_transformation)
from cvo_slam_tpu.tracking.types import Keyframe


def checkerboard_scene(seed=0, h=240, w=320):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.uint8)
    for _ in range(120):
        x, y = rng.integers(10, w - 20), rng.integers(10, h - 20)
        s = rng.integers(4, 12)
        img[y:y + s, x:x + s] = rng.integers(60, 255)
    return img


@pytest.fixture(scope="module")
def orb_kf():
    gray = checkerboard_scene()
    depth = np.full(gray.shape, 2.0, np.float32)
    ext = OrbExtractor(OrbParams(n_features=500, n_levels=4))
    sel = np.array([[10, 10]], np.int32)
    kp, ang, desc = ext.extract(gray, depth, sel)
    return gray, depth, kp, ang, desc


def test_orb_extract_basics(orb_kf):
    gray, depth, kp, ang, desc = orb_kf
    assert len(kp) > 50
    assert desc.shape == (len(kp), 32)
    assert np.all(kp[:, 0] < gray.shape[1]) and np.all(kp[:, 1] < gray.shape[0])
    # deterministic
    ext = OrbExtractor(OrbParams(n_features=500, n_levels=4))
    kp2, _, desc2 = ext.extract(gray, depth, np.array([[10, 10]], np.int32))
    np.testing.assert_array_equal(kp, kp2)
    np.testing.assert_array_equal(desc, desc2)


def test_orb_empty_selection_rejects_all(orb_kf):
    gray, depth, *_ = orb_kf
    ext = OrbExtractor(OrbParams(n_features=500, n_levels=4))
    kp, _, _ = ext.extract(gray, depth, np.zeros((0, 2), np.int32))
    assert len(kp) == 0


def test_vocabulary_roundtrip(orb_kf):
    *_, desc = orb_kf
    voc = bow.Vocabulary.train(desc, k=5, L=3)
    v1, fv1 = voc.transform(desc)
    assert len(v1) > 0 and len(fv1) > 0
    assert bow.Vocabulary.score(v1, v1) == pytest.approx(1.0, abs=1e-6)
    # different descriptors score lower than self
    v2, _ = voc.transform(desc[: len(desc) // 3])
    s12 = bow.Vocabulary.score(v1, v2)
    assert 0.0 < s12 <= 1.0


def test_match_bow_identical_keyframes(orb_kf):
    gray, depth, kp, ang, desc = orb_kf
    voc = bow.Vocabulary.train(desc, k=5, L=3)
    bv, fv = voc.transform(desc)
    kf = Keyframe(id=0, timestamp="0", pose=np.eye(4), gray=gray,
                  depth_m=depth, keypoints=kp, kp_angle=ang, descriptors=desc,
                  bow_vec=bv, feat_vec=fv)
    pairs = match_bow(kf, kf, nn_ratio=0.9)
    assert len(pairs) > 30
    # identical keyframes match onto themselves
    frac_self = np.mean(pairs[:, 0] == pairs[:, 1])
    assert frac_self > 0.9


def test_kabsch_recovers_transform():
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, (10, 3))
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t = np.array([0.2, -0.1, 0.5])
    dst = src @ R.T + t
    T = kabsch(src, dst)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-9)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-9)


def test_pose_refinement_improves():
    rng = np.random.default_rng(1)
    n = 40
    pts = rng.uniform(-1, 1, (n, 3)) + np.array([0, 0, 3.0])
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    from cvo_slam_tpu.ops import se3
    import jax.numpy as jnp
    xi = np.array([0.03, -0.02, 0.04, 0.1, -0.05, 0.08], np.float32)
    T_true = np.asarray(se3.exp_se3(jnp.asarray(xi)), np.float64)
    E_true = np.linalg.inv(T_true)
    P = pts @ E_true[:3, :3].T + E_true[:3, 3]
    uv = (P @ K.T)
    uv = uv[:, :2] / uv[:, 2:3]
    T0 = np.eye(4)   # poor initial guess
    T_ref = optimize_relative_transformation(
        uv, pts, np.ones(8), np.zeros(n, int), K, T0, delta=0.0)
    err = np.linalg.norm(T_ref - T_true)
    err0 = np.linalg.norm(T0 - T_true)
    assert err < 0.05 * err0


def test_orbvoc_text_roundtrip(tmp_path, orb_kf):
    """DBoW2 text format: write a vocabulary in the reference's format, load
    it, and check transform/score behave identically to the source."""
    *_, desc = orb_kf
    voc = bow.Vocabulary.train(desc, k=3, L=2)
    # serialize in DBoW2 text layout: header 'k L s w'; rows
    # 'parent is_leaf d0..d31 weight' in BFS order
    lines = ["3 2 0 0"]
    id_map = {}   # our node id -> file order index (root excluded, root=0)
    order = []
    stack = [0]
    while stack:
        nid = stack.pop(0)
        for ch in voc.children[nid]:
            order.append((nid, ch))
            stack.append(ch)
    for parent, ch in order:
        id_map[ch] = len(id_map) + 1
    for parent, ch in order:
        p_idx = 0 if parent == 0 else id_map[parent]
        is_leaf = 1 if ch in voc.word_of_node else 0
        d = " ".join(str(int(v)) for v in voc.node_desc[ch])
        w = voc.node_weight[ch]
        lines.append(f"{p_idx} {is_leaf} {d} {w}")
    path = tmp_path / "voc.txt"
    path.write_text("\n".join(lines) + "\n")

    loaded = bow.load_orbvoc_text(str(path))
    v1, _ = voc.transform(desc)
    v2, _ = loaded.transform(desc)
    s_self = bow.Vocabulary.score(v2, v2)
    assert s_self == pytest.approx(1.0, abs=1e-6)
    # same descriptor set scores identically against itself through both
    half = desc[: len(desc) // 2]
    h1, _ = voc.transform(half)
    h2, _ = loaded.transform(half)
    assert bow.Vocabulary.score(v1, h1) == pytest.approx(
        bow.Vocabulary.score(v2, h2), abs=1e-9)


def test_homography_batched_matches_cv2():
    """Batched normalized DLT == cv2.findHomography on exact 4-point samples
    (projectively: compare the induced warps, not the scale of H)."""
    from cvo_slam_tpu.features.matcher import homography_batched
    rng = np.random.default_rng(3)
    S, npts = 32, 4
    src = rng.uniform(0, 640, (S, npts, 2))
    dst = rng.uniform(0, 480, (S, npts, 2))
    Hb = homography_batched(src, dst)
    for s in range(S):
        # exactness: a 4-point homography maps its own samples exactly
        wb = cv2.perspectiveTransform(src[s].reshape(-1, 1, 2),
                                      Hb[s] / Hb[s, 2, 2]).reshape(-1, 2)
        np.testing.assert_allclose(wb, dst[s], rtol=1e-6, atol=1e-5)
        # and agrees with cv2 on in-hull probes (homogeneous warps diverge
        # arbitrarily near the horizon line, so probe inside the sample hull)
        Hc, _ = cv2.findHomography(src[s], dst[s])
        if Hc is None:
            continue
        wgt = rng.dirichlet(np.ones(4), size=10)
        probe = wgt @ src[s]
        pb = cv2.perspectiveTransform(probe.reshape(-1, 1, 2),
                                      Hb[s] / Hb[s, 2, 2]).reshape(-1, 2)
        pc = cv2.perspectiveTransform(probe.reshape(-1, 1, 2),
                                      Hc).reshape(-1, 2)
        np.testing.assert_allclose(pb, pc, rtol=1e-3, atol=1e-2)


def test_kabsch_batched_matches_solo():
    from cvo_slam_tpu.features.matcher import kabsch_batched
    rng = np.random.default_rng(4)
    src = rng.normal(size=(16, 4, 3))
    dst = rng.normal(size=(16, 4, 3))
    Rt = kabsch_batched(src, dst)
    for s in range(16):
        T = kabsch(src[s], dst[s])
        np.testing.assert_allclose(Rt[s, :, :3], T[:3, :3], atol=1e-10)
        np.testing.assert_allclose(Rt[s, :, 3], T[:3, 3], atol=1e-10)


def test_growing_vocabulary_retrains_with_idf(orb_kf):
    *_, desc = orb_kf
    rng = np.random.default_rng(5)
    voc = bow.GrowingVocabulary(k=5, L=2, max_desc_per_doc=60)
    versions = []
    for i in range(9):
        # distinct per-"keyframe" documents: random subsets + bit noise
        idx = rng.choice(len(desc), size=80, replace=False)
        d = desc[idx].copy()
        d[:, i % 32] ^= np.uint8(1 << (i % 8))
        voc.add_document(d)
        versions.append(voc.version)
    # retrains at doc counts 1, 2, 4, 8 -> version increments
    assert versions[0] == 1 and versions[1] == 2
    assert versions[3] == 3 and versions[7] == 4
    assert versions[8] == 4  # no retrain at 9
    # real IDF: weights vary across words (not all 1.0)
    w = [voc._voc.node_weight[n] for n in voc._voc.node_of_word]
    assert len(set(np.round(w, 6))) > 1
    # transform still scores self == 1
    v1, fv1 = voc.transform(desc)
    assert bow.Vocabulary.score(v1, v1) == pytest.approx(1.0, abs=1e-6)


def test_stale_bow_refresh_semantics(orb_kf):
    """Keyframes transformed under an old vocabulary version are re-usable:
    transform under the new version scores self-similarity 1."""
    *_, desc = orb_kf
    voc = bow.GrowingVocabulary(k=5, L=2)
    voc.add_document(desc[:100])
    old_v, _ = voc.transform(desc[:100])
    old_version = voc.version
    voc.add_document(desc[100:200])   # doc count 2 -> retrain
    assert voc.version > old_version
    new_v, _ = voc.transform(desc[:100])
    assert bow.Vocabulary.score(new_v, new_v) == pytest.approx(1.0, abs=1e-6)


def test_device_match_bow_parity():
    """Device best-two matching (dispatch_match_bow/fetch_match_bow) must
    reproduce the host match_bow pairs exactly, including first-minimum tie
    semantics and the rotation-histogram filter."""
    from cvo_slam_tpu.features.matcher import (dispatch_match_bow,
                                               fetch_match_bow)
    rng = np.random.default_rng(3)
    n1, n2 = 700, 650
    # low-entropy descriptors force plenty of distance ties
    d1 = rng.integers(0, 4, (n1, 32)).astype(np.uint8)
    d2 = rng.integers(0, 4, (n2, 32)).astype(np.uint8)

    def kf(desc, n, nodes):
        k = Keyframe(id=0, timestamp="0", pose=np.eye(4))
        k.descriptors = desc
        k.kp_angle = rng.uniform(0, 360, n)
        # multi-bucket FeatureVector with uneven splits; node 9 exists only
        # on the ref side (no common partner), node 5 has a single cur
        # descriptor (the second=256 host convention)
        cuts = np.sort(rng.choice(np.arange(1, n), len(nodes) - 1,
                                  replace=False))
        parts = np.split(np.arange(n), cuts)
        k.feat_vec = {node: parts[j].tolist()
                      for j, node in enumerate(nodes)}
        return k

    ref = kf(d1, n1, [0, 2, 5, 9])
    cur = kf(d2, n2, [0, 2, 7, 11])
    cur.feat_vec[5] = [int(cur.feat_vec[7][0])]   # single-descriptor bucket
    host = match_bow(ref, cur, 0.7)
    fut = dispatch_match_bow(ref, cur, force=True)
    assert fut is not None
    dev = fetch_match_bow(fut, ref, cur, 0.7)
    np.testing.assert_array_equal(host, dev)
