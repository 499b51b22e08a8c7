"""FFHQ-style face restoration helper (detect -> align -> restore -> paste).

Parity target: /root/reference/utils/face_restoration_helper.py
(``FaceRestoreHelper`` — a SUPIR leftover that is dormant in the reference:
never imported by its inference entry points). Rebuilt TPU-native for
component completeness:

- facexlib's retinaface detector and parsenet parser are external CUDA
  models the reference downloads at runtime; here detection is PLUGGABLE
  (pass ``detector(img_bgr) -> bboxes [N, 15]`` — the facexlib layout
  ``x0,y0,x1,y1,score,lm0x,lm0y,...lm4y`` — or feed 5-point landmarks
  directly via :meth:`add_landmarks`). ``use_parse`` has no parsenet here
  and is rejected loudly.
- The geometry/compositing core (similarity estimation, affine warp,
  erosion, gaussian blur, soft-mask paste) is implemented on JAX ops and
  jit-compiled, replacing the cv2 CUDA/host kernels
  (face_restoration_helper.py:310-341, 361-505).

cv2.estimateAffinePartial2D(method=LMEDS) on the 5 clean template points is
the closed-form least-squares similarity transform — implemented here as
the Umeyama algorithm (similarity: scale + rotation + translation).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

# standard 5 landmarks for FFHQ faces with 512 x 512
# (face_restoration_helper.py:80-82)
FFHQ_TEMPLATE_512 = np.array(
    [[192.98138, 239.94708], [318.90277, 240.1936], [256.63416, 314.01935],
     [201.26117, 371.41043], [313.08905, 371.15118]])
# 3-point variant (face_restoration_helper.py:76)
TEMPLATE_3POINTS = np.array([[192, 240], [319, 240], [257, 371]])
# dlib template at 1024 (face_restoration_helper.py:72-75)
DLIB_TEMPLATE_1024 = np.array(
    [[686.77227723, 488.62376238], [586.77227723, 493.59405941],
     [337.91089109, 488.38613861], [437.95049505, 493.51485149],
     [513.58415842, 678.5049505]])


def estimate_similarity_transform(src: np.ndarray,
                                  dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform (Umeyama) mapping src -> dst
    points. src/dst: [N, 2]. Returns the 2x3 affine matrix, matching
    cv2.estimateAffinePartial2D(src, dst, method=cv2.LMEDS) on clean
    points (face_restoration_helper.py:317)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)                     # [2, 2]
    u, s, vt = np.linalg.svd(cov)
    d = np.ones(2)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        d[1] = -1
    r = u @ np.diag(d) @ vt
    var_s = (sc ** 2).sum() / len(src)
    scale = (s * d).sum() / var_s
    t = mu_d - scale * (r @ mu_s)
    m = np.zeros((2, 3))
    m[:, :2] = scale * r
    m[:, 2] = t
    return m


def invert_affine(m: np.ndarray) -> np.ndarray:
    """Invert a 2x3 affine matrix (cv2.invertAffineTransform)."""
    a = np.asarray(m, np.float64)
    inv_lin = np.linalg.inv(a[:, :2])
    out = np.zeros((2, 3))
    out[:, :2] = inv_lin
    out[:, 2] = -inv_lin @ a[:, 2]
    return out


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def _warp_affine_jit(img, minv, out_h: int, out_w: int, border_value):
    h, w = img.shape[:2]
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                  # [H', W']
    sx = minv[0, 0] * gx + minv[0, 1] * gy + minv[0, 2]
    sy = minv[1, 0] * gx + minv[1, 1] * gy + minv[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        yi_c = jnp.clip(yi, 0, h - 1)
        xi_c = jnp.clip(xi, 0, w - 1)
        v = img[yi_c, xi_c]                        # [H', W', C]
        return jnp.where(inside[..., None], v, border_value)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return out


def warp_affine(img: np.ndarray, m: np.ndarray, dsize: tuple[int, int],
                border_value=0.0) -> np.ndarray:
    """cv2.warpAffine equivalent (bilinear, constant border): dst(x) =
    src(M^-1 x) with M the 2x3 src->dst affine. dsize = (w, h). Channels
    optional; computed in fp32 on device."""
    out_w, out_h = dsize
    squeeze = img.ndim == 2
    arr = np.asarray(img, np.float32)
    if squeeze:
        arr = arr[..., None]
    minv = jnp.asarray(invert_affine(m), jnp.float32)
    bv = jnp.asarray(np.broadcast_to(
        np.asarray(border_value, np.float32), (arr.shape[2],)))
    out = np.asarray(_warp_affine_jit(jnp.asarray(arr), minv, out_h, out_w,
                                      bv))
    return out[..., 0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("k",))
def _erode_jit(mask, k: int):
    # cv2.erode: min filter; default border = +inf for erosion so borders
    # do not shrink the mask from outside
    pad = [(k // 2, k - 1 - k // 2), (k // 2, k - 1 - k // 2)]
    return -jax.lax.reduce_window(-mask, -jnp.inf, jax.lax.max,
                                  (k, k), (1, 1), [(p, q) for p, q in pad])


def erode(mask: np.ndarray, ksize: int) -> np.ndarray:
    """cv2.erode(mask, ones(ksize, ksize)) equivalent (2D float mask)."""
    if ksize <= 1:
        return np.asarray(mask, np.float32)
    return np.asarray(_erode_jit(jnp.asarray(mask, jnp.float32), int(ksize)))


_CV2_SMALL_GAUSSIAN = {  # getGaussianKernel's fixed tables (sigma<=0, k<=7)
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    if sigma <= 0 and ksize in _CV2_SMALL_GAUSSIAN:
        return np.asarray(_CV2_SMALL_GAUSSIAN[ksize], np.float32)
    if sigma <= 0:
        # cv2 default sigma from ksize (getGaussianKernel docs)
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("ksize",))
def _gaussian_blur_jit(img, kern, ksize: int):
    # separable conv, BORDER_REFLECT101 (cv2 default)
    p = ksize // 2
    x = jnp.pad(img, ((p, p), (p, p), (0, 0)), mode="reflect")
    x = jax.vmap(lambda c: jnp.apply_along_axis(
        lambda r: jnp.convolve(r, kern, mode="valid"), 0, c),
        in_axes=2, out_axes=2)(x)
    x = jax.vmap(lambda c: jnp.apply_along_axis(
        lambda r: jnp.convolve(r, kern, mode="valid"), 1, c),
        in_axes=2, out_axes=2)(x)
    return x


def gaussian_blur(img: np.ndarray, ksize: int, sigma: float = 0.0
                  ) -> np.ndarray:
    """cv2.GaussianBlur equivalent (separable, reflect-101 border)."""
    if ksize <= 1:
        return np.asarray(img, np.float32)
    squeeze = img.ndim == 2
    arr = np.asarray(img, np.float32)
    if squeeze:
        arr = arr[..., None]
    kern = jnp.asarray(_gaussian_kernel1d(int(ksize), float(sigma)))
    out = np.asarray(_gaussian_blur_jit(jnp.asarray(arr), kern, int(ksize)))
    return out[..., 0] if squeeze else out


def _resize_linear(img: np.ndarray, w: int, h: int) -> np.ndarray:
    out = jax.image.resize(jnp.asarray(img, jnp.float32),
                           (h, w) + img.shape[2:], method="linear")
    return np.asarray(out)


def get_largest_face(det_faces, h, w):
    """face_restoration_helper.py:14-32: pick max clipped-bbox area."""
    def loc(val, length):
        return int(max(min(val, length), 0))
    areas = [(loc(f[2], w) - loc(f[0], w)) * (loc(f[3], h) - loc(f[1], h))
             for f in det_faces]
    idx = int(np.argmax(areas))
    return [det_faces[idx]], idx


def get_center_face(det_faces, h=0, w=0, center=None):
    """face_restoration_helper.py:35-46: min distance to image center."""
    center = np.array([w / 2, h / 2]) if center is None else np.array(center)
    dists = [np.linalg.norm(np.array([(f[0] + f[2]) / 2, (f[1] + f[3]) / 2])
                            - center) for f in det_faces]
    idx = int(np.argmin(dists))
    return [det_faces[idx]], idx


@dataclass
class FaceRestoreHelper:
    """TPU-native FaceRestoreHelper (face_restoration_helper.py:49-512).

    detector: optional callable img_bgr[H,W,3] -> np.ndarray [N, 15]
    (facexlib retinaface layout). Without one, landmarks must be fed via
    :meth:`add_landmarks`."""

    upscale_factor: int
    face_size: int = 512
    crop_ratio: tuple[float, float] = (1, 1)
    template_3points: bool = False
    detector: object = None
    use_parse: bool = False

    all_landmarks_5: list = field(default_factory=list)
    det_faces: list = field(default_factory=list)
    affine_matrices: list = field(default_factory=list)
    inverse_affine_matrices: list = field(default_factory=list)
    cropped_faces: list = field(default_factory=list)
    restored_faces: list = field(default_factory=list)

    def __post_init__(self):
        self.upscale_factor = int(self.upscale_factor)
        assert self.crop_ratio[0] >= 1 and self.crop_ratio[1] >= 1, \
            "crop ratio only supports >=1"
        if self.use_parse:
            raise NotImplementedError(
                "use_parse needs facexlib's parsenet (external CUDA model, "
                "not available); the square soft mask path is implemented")
        fs = self.face_size
        self.face_size_wh = (int(fs * self.crop_ratio[1]),
                             int(fs * self.crop_ratio[0]))
        tmpl = (TEMPLATE_3POINTS if self.template_3points
                else FFHQ_TEMPLATE_512).astype(np.float64)
        tmpl = tmpl * (fs / 512.0)
        if self.crop_ratio[0] > 1:
            tmpl[:, 1] += fs * (self.crop_ratio[0] - 1) / 2
        if self.crop_ratio[1] > 1:
            tmpl[:, 0] += fs * (self.crop_ratio[1] - 1) / 2
        self.face_template = tmpl
        self.input_img = None

    # -- input ------------------------------------------------------------
    def read_image(self, img: np.ndarray):
        """img: BGR uint8/uint16 HWC (or gray / BGRA) -> fp32 BGR
        (face_restoration_helper.py:122-142)."""
        img = np.asarray(img)
        if img.dtype == np.uint16 or img.max() > 256:
            img = img.astype(np.float32) / 65535 * 255
        else:
            img = img.astype(np.float32)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=2)
        elif img.shape[2] == 4:
            img = img[:, :, :3]
        self.input_img = img
        if min(img.shape[:2]) < 512:
            f = 512.0 / min(img.shape[:2])
            h, w = img.shape[:2]
            self.input_img = _resize_linear(img, int(w * f), int(h * f))

    # -- detection --------------------------------------------------------
    def get_face_landmarks_5(self, only_keep_largest=False,
                             only_center_face=False, resize=None,
                             eye_dist_threshold=None) -> int:
        if self.detector is None:
            raise RuntimeError(
                "no detector plugged in — pass detector= or use "
                "add_landmarks()")
        if resize is None:
            scale, input_img = 1.0, self.input_img
        else:
            h, w = self.input_img.shape[:2]
            scale = max(1.0, resize / min(h, w))
            input_img = _resize_linear(self.input_img,
                                       int(w * scale), int(h * scale))
        bboxes = self.detector(input_img)
        if bboxes is None or len(bboxes) == 0:
            return 0
        bboxes = np.asarray(bboxes, np.float64) / scale
        for bbox in bboxes:
            eye_dist = np.linalg.norm([bbox[6] - bbox[8], bbox[7] - bbox[9]])
            if eye_dist_threshold is not None and eye_dist < eye_dist_threshold:
                continue
            if self.template_3points:
                lm = np.array([[bbox[i], bbox[i + 1]]
                               for i in range(5, 11, 2)])
            else:
                lm = np.array([[bbox[i], bbox[i + 1]]
                               for i in range(5, 15, 2)])
            self.all_landmarks_5.append(lm)
            self.det_faces.append(bbox[0:5])
        if not self.det_faces:
            return 0
        h, w = self.input_img.shape[:2]
        if only_keep_largest:
            self.det_faces, idx = get_largest_face(self.det_faces, h, w)
            self.all_landmarks_5 = [self.all_landmarks_5[idx]]
        elif only_center_face:
            self.det_faces, idx = get_center_face(self.det_faces, h, w)
            self.all_landmarks_5 = [self.all_landmarks_5[idx]]
        return len(self.all_landmarks_5)

    def add_landmarks(self, landmarks_5: np.ndarray):
        """Directly feed one face's 5-point landmarks [5, 2] (detector-free
        path)."""
        self.all_landmarks_5.append(np.asarray(landmarks_5, np.float64))

    # -- align ------------------------------------------------------------
    def align_warp_face(self, border_mode="constant"):
        assert border_mode == "constant", border_mode
        for lm in self.all_landmarks_5:
            m = estimate_similarity_transform(lm, self.face_template)
            self.affine_matrices.append(m)
            cropped = warp_affine(self.input_img, m, self.face_size_wh,
                                  border_value=(135.0, 133.0, 132.0))
            self.cropped_faces.append(np.clip(cropped, 0, 255))

    def get_inverse_affine(self):
        for m in self.affine_matrices:
            self.inverse_affine_matrices.append(
                invert_affine(m) * self.upscale_factor)

    def add_restored_face(self, restored_face, input_face=None):
        self.restored_faces.append(np.asarray(restored_face, np.float32))

    # -- paste ------------------------------------------------------------
    def paste_faces_to_input_image(self, upsample_img=None) -> np.ndarray:
        h, w = self.input_img.shape[:2]
        h_up = int(h * self.upscale_factor)
        w_up = int(w * self.upscale_factor)
        if upsample_img is None:
            upsample_img = _resize_linear(self.input_img, w_up, h_up)
        else:
            upsample_img = _resize_linear(
                np.asarray(upsample_img, np.float32), w_up, h_up)
        # grayscale/alpha backgrounds (face_restoration_helper.py handles
        # both): blend in 3 channels, re-attach alpha afterwards
        alpha = None
        if upsample_img.ndim == 2:
            upsample_img = np.repeat(upsample_img[:, :, None], 3, axis=2)
        elif upsample_img.shape[2] == 4:
            alpha = upsample_img[:, :, 3:]
            upsample_img = upsample_img[:, :, :3]
        assert len(self.restored_faces) == len(self.inverse_affine_matrices)
        for restored, inv in zip(self.restored_faces,
                                 self.inverse_affine_matrices):
            inv = inv.copy()
            if self.upscale_factor > 1:
                # half-pixel offset for more precise back alignment
                # (face_restoration_helper.py:384-388)
                inv[:, 2] += 0.5 * self.upscale_factor
            inv_restored = warp_affine(restored, inv, (w_up, h_up))
            mask = np.ones(self.face_size_wh[::-1], np.float32)
            inv_mask = warp_affine(mask, inv, (w_up, h_up))
            # remove black borders (warp edge antialiasing)
            inv_mask_ero = erode(inv_mask, int(2 * self.upscale_factor))
            pasted_face = inv_mask_ero[:, :, None] * inv_restored
            total_area = float(inv_mask_ero.sum())
            # fusion edge width scales with face area
            w_edge = int(total_area ** 0.5) // 20
            inv_mask_center = erode(inv_mask_ero, max(1, w_edge * 2))
            soft = gaussian_blur(inv_mask_center, max(1, w_edge * 2 + 1))
            soft = soft[:, :, None]
            upsample_img = soft * pasted_face + (1 - soft) * upsample_img
        if alpha is not None:
            upsample_img = np.concatenate([upsample_img, alpha], axis=2)
        return np.clip(upsample_img, 0, 255).astype(np.uint8)

    def clean_all(self):
        self.all_landmarks_5 = []
        self.det_faces = []
        self.affine_matrices = []
        self.inverse_affine_matrices = []
        self.cropped_faces = []
        self.restored_faces = []
