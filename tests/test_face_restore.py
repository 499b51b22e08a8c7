"""Face restoration helper vs the cv2 kernels the reference uses
(/root/reference/utils/face_restoration_helper.py — dormant there; the
geometry/compositing core here is oracle-checked against cv2 directly)."""

import numpy as np
import pytest

from rsvldm_tpu.utils.face_restore import (FFHQ_TEMPLATE_512,
                                           FaceRestoreHelper,
                                           erode,
                                           estimate_similarity_transform,
                                           gaussian_blur, get_center_face,
                                           get_largest_face, invert_affine,
                                           warp_affine)

cv2 = pytest.importorskip("cv2")


def _rand_similarity(rng):
    th = rng.uniform(-0.6, 0.6)
    s = rng.uniform(0.5, 2.0)
    t = rng.uniform(-40, 40, size=2)
    m = np.zeros((2, 3))
    m[:, :2] = s * np.array([[np.cos(th), -np.sin(th)],
                             [np.sin(th), np.cos(th)]])
    m[:, 2] = t
    return m


def _apply(m, pts):
    return pts @ m[:, :2].T + m[:, 2]


def test_similarity_estimation_matches_cv2_lmeds():
    rng = np.random.default_rng(0)
    for _ in range(5):
        m = _rand_similarity(rng)
        src = FFHQ_TEMPLATE_512 + rng.normal(scale=0.5, size=(5, 2))
        dst = _apply(m, src)
        ours = estimate_similarity_transform(src, dst)
        ref = cv2.estimateAffinePartial2D(
            src.astype(np.float64), dst.astype(np.float64),
            method=cv2.LMEDS)[0]
        assert np.allclose(ours, ref, atol=1e-6), (ours, ref)


def test_similarity_estimation_noisy_matches_cv2():
    """With landmark noise LMEDS on 5 points degenerates to least squares —
    the Umeyama fit must still agree."""
    rng = np.random.default_rng(1)
    m = _rand_similarity(rng)
    src = FFHQ_TEMPLATE_512
    dst = _apply(m, src) + rng.normal(scale=1.5, size=(5, 2))
    ours = estimate_similarity_transform(src, dst)
    ref = cv2.estimateAffinePartial2D(src, dst, method=cv2.LMEDS)[0]
    assert np.allclose(ours, ref, atol=1e-5)


def test_invert_affine_matches_cv2():
    m = _rand_similarity(np.random.default_rng(2))
    assert np.allclose(invert_affine(m), cv2.invertAffineTransform(m),
                       atol=1e-10)


def test_warp_affine_matches_cv2_bilinear():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, size=(64, 80, 3)).astype(np.float32)
    m = np.array([[0.9, -0.2, 8.0], [0.2, 0.9, -5.0]])
    ours = warp_affine(img, m, (72, 60), border_value=(135.0, 133.0, 132.0))
    ref = cv2.warpAffine(img, m, (72, 60), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT,
                         borderValue=(135, 133, 132))
    # cv2 uses 5-bit fixed-point interpolation weights
    assert np.max(np.abs(ours - ref)) < 0.75, np.max(np.abs(ours - ref))


def test_erode_matches_cv2():
    rng = np.random.default_rng(4)
    mask = (rng.uniform(size=(40, 52)) > 0.3).astype(np.float32)
    for k in (2, 3, 5, 8):
        ours = erode(mask, k)
        ref = cv2.erode(mask, np.ones((k, k), np.uint8))
        assert np.array_equal(ours, ref), k


def test_gaussian_blur_matches_cv2():
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, size=(48, 40)).astype(np.float32)
    for k in (3, 7, 11):
        ours = gaussian_blur(img, k)
        ref = cv2.GaussianBlur(img, (k, k), 0)
        assert np.max(np.abs(ours - ref)) < 2e-4, (k,
                                                   np.max(np.abs(ours - ref)))


def test_largest_and_center_face_selection():
    faces = [np.array([0, 0, 10, 10, 0.9]),
             np.array([20, 20, 60, 60, 0.8]),
             np.array([45, 45, 55, 55, 0.7])]
    sel, idx = get_largest_face(faces, 100, 100)
    assert idx == 1
    sel, idx = get_center_face(faces, 100, 100)
    assert idx == 2


def test_helper_end_to_end_identity_restore():
    """Align a synthetic face, 'restore' it unchanged, paste back: the face
    region of the output must match the plain upsampled background."""
    rng = np.random.default_rng(6)
    img = rng.uniform(40, 200, size=(560, 600, 3)).astype(np.float32)
    # landmarks = template mapped into the image by a known similarity
    m = np.array([[0.4, -0.1, 150.0], [0.1, 0.4, 120.0]])
    lms = _apply(m, FFHQ_TEMPLATE_512)

    helper = FaceRestoreHelper(upscale_factor=2)
    helper.read_image(img.astype(np.uint8))
    helper.add_landmarks(lms)
    helper.align_warp_face()
    assert len(helper.cropped_faces) == 1
    assert helper.cropped_faces[0].shape == (512, 512, 3)
    helper.get_inverse_affine()
    helper.add_restored_face(helper.cropped_faces[0])
    out = helper.paste_faces_to_input_image()
    h, w = helper.input_img.shape[:2]
    assert out.shape == (h * 2, w * 2, 3) and out.dtype == np.uint8

    # identity restore => output ~= plain background upsample everywhere
    import jax
    import jax.numpy as jnp
    bg = np.asarray(jax.image.resize(
        jnp.asarray(helper.input_img), (h * 2, w * 2, 3), method="linear"))
    diff = np.abs(out.astype(np.float32) - bg)
    # small resampling error from warp->unwarp round trip is expected
    assert np.mean(diff) < 2.0, np.mean(diff)
    assert np.percentile(diff, 99) < 30


def test_helper_detector_plumbing():
    """Pluggable detector: bbox layout, eye-dist filter, largest-only."""
    calls = []

    def det(img):
        calls.append(img.shape)
        big = np.r_[100, 100, 400, 400, 0.99,
                    _apply(np.eye(2, 3), FFHQ_TEMPLATE_512 * 0.6).ravel()]
        tiny = np.r_[0, 0, 6, 6, 0.5, [1, 1, 2, 1, 1.5, 1.5, 1, 2, 2, 2]]
        return np.stack([big, tiny])

    helper = FaceRestoreHelper(upscale_factor=1, detector=det)
    helper.read_image(np.zeros((520, 520, 3), np.uint8))
    n = helper.get_face_landmarks_5(only_keep_largest=True,
                                    eye_dist_threshold=5.0)
    assert n == 1 and len(calls) == 1
    assert helper.all_landmarks_5[0].shape == (5, 2)


def test_use_parse_rejected():
    with pytest.raises(NotImplementedError):
        FaceRestoreHelper(upscale_factor=1, use_parse=True)


def test_paste_handles_gray_and_bgra_backgrounds():
    """face_restoration_helper.py blends grayscale backgrounds per-channel
    and preserves an alpha plane — paste must accept both layouts."""
    rng = np.random.default_rng(8)
    img = rng.uniform(40, 200, size=(560, 600, 3)).astype(np.float32)
    m = np.array([[0.4, -0.1, 150.0], [0.1, 0.4, 120.0]])
    lms = _apply(m, FFHQ_TEMPLATE_512)

    helper = FaceRestoreHelper(upscale_factor=1)
    helper.read_image(img.astype(np.uint8))
    helper.add_landmarks(lms)
    helper.align_warp_face()
    helper.get_inverse_affine()
    helper.add_restored_face(helper.cropped_faces[0])

    h, w = helper.input_img.shape[:2]
    gray = np.full((h, w), 90.0, np.float32)
    out = helper.paste_faces_to_input_image(upsample_img=gray)
    assert out.shape == (h, w, 3) and out.dtype == np.uint8

    bgra = np.concatenate([img, np.full((h, w, 1), 255.0, np.float32)],
                          axis=2)
    out4 = helper.paste_faces_to_input_image(upsample_img=bgra)
    assert out4.shape == (h, w, 4)
    np.testing.assert_array_equal(out4[:, :, 3], 255)
