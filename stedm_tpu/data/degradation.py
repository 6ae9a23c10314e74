"""BSRGAN blind-super-resolution degradation pipeline (dead code in the shipped
reference configs — no config instantiates it — surface kept for completeness).

Reference: `ldm/modules/image_degradation/__init__.py` (exports
``degradation_fn_bsr`` / ``degradation_fn_bsr_light``), `bsrgan.py`,
`bsrgan_light.py` and the MATLAB-bicubic resize from `utils_image.py:700-930`.

This is host-side data-augmentation code: it runs in the input-pipeline workers
on numpy/cv2/scipy and never touches the TPU. Two deliberate re-designs:

* **Explicit RNG.** Every stochastic op threads a ``np.random.Generator``
  (repo convention, `stedm_tpu/data/loader.py`) instead of the reference's
  process-global ``random`` + ``np.random`` state — so a worker's degradations
  are reproducible from its (seed, epoch, idx) stream. Probabilities, ranges
  and op order match the reference exactly; the raw random *sequence*
  necessarily differs.
* **Vectorized MATLAB bicubic.** ``imresize`` reproduces
  `utils_image.py:calculate_weights_indices/imresize_np` (symmetric padding,
  antialiased cubic window) as two gather+matmul contractions instead of the
  reference's per-row torch loops; parity-tested against the reference
  function in `tests/test_degradation.py`.
"""

from __future__ import annotations

import math
from functools import partial

import cv2
import numpy as np
from scipy import ndimage

# cv2 interpolation codes 1/2/3 = linear/cubic/area, as sampled by the
# reference's `random.choice([1, 2, 3])` (bsrgan.py:347 etc.)
_CV2_INTERPS = (1, 2, 3)


def _rng(rng: np.random.Generator | None) -> np.random.Generator:
    return np.random.default_rng() if rng is None else rng


# ---------------------------------------------------------------------------
# dtype helpers (utils_image.py:249-256)
# ---------------------------------------------------------------------------

def uint2single(img: np.ndarray) -> np.ndarray:
    return np.float32(img / 255.0)


def single2uint(img: np.ndarray) -> np.ndarray:
    return np.uint8((img.clip(0, 1) * 255.0).round())


# ---------------------------------------------------------------------------
# MATLAB-style bicubic resize (utils_image.py:700-760, 839-930)
# ---------------------------------------------------------------------------

def _cubic(x: np.ndarray) -> np.ndarray:
    """Keys cubic kernel a=-0.5 (utils_image.py:700-705)."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    return ((1.5 * ax3 - 2.5 * ax2 + 1.0) * (ax <= 1)
            + (-0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0) * ((ax > 1) & (ax <= 2)))


def _resize_contraction(in_len: int, scale: float, antialiasing: bool):
    """Weights (out, P) + 0-based input indices (out, P) for one axis
    (utils_image.py:708-760), including the all-zero edge-column trim."""
    out_len = math.ceil(in_len * scale)
    kernel_width = 4.0 / scale if (scale < 1 and antialiasing) else 4.0
    u = (np.arange(1, out_len + 1, dtype=np.float64)) / scale \
        + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    P = int(math.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(P)[None, :]
    dist = u[:, None] - indices
    if scale < 1 and antialiasing:
        weights = scale * _cubic(dist * scale)
    else:
        weights = _cubic(dist)
    weights = weights / weights.sum(axis=1, keepdims=True)
    zero_cols = (weights == 0).sum(axis=0)
    if not math.isclose(zero_cols[0], 0, rel_tol=1e-6):
        indices, weights = indices[:, 1:P - 1], weights[:, 1:P - 1]
    if not math.isclose(zero_cols[-1], 0, rel_tol=1e-6):
        indices, weights = indices[:, 0:P - 2], weights[:, 0:P - 2]
    # MATLAB 1-based -> 0-based, then fold out-of-range indices through the
    # symmetric boundary (equivalent to the reference's physical sym-padding)
    idx = indices.astype(np.int64) - 1
    period = 2 * in_len
    idx = np.mod(idx, period)
    idx = np.where(idx >= in_len, period - 1 - idx, idx)
    return weights.astype(np.float32), idx


def imresize(img: np.ndarray, scale: float,
             antialiasing: bool = True) -> np.ndarray:
    """`utils_image.py:imresize_np` — HWC or HW float [0,1], no rounding."""
    squeeze = img.ndim == 2
    x = img[:, :, None] if squeeze else img
    x = x.astype(np.float32, copy=False)
    for axis in (0, 1):
        w, idx = _resize_contraction(x.shape[axis], scale, antialiasing)
        gathered = np.take(x, idx, axis=axis)  # (..out,P..) along axis
        if axis == 0:
            x = np.einsum("opwc,op->owc", gathered, w)
        else:
            x = np.einsum("hopc,op->hoc", gathered, w)
    return x[:, :, 0] if squeeze else x


imresize_np = imresize  # reference alias


# ---------------------------------------------------------------------------
# blur kernels (bsrgan.py:49-227)
# ---------------------------------------------------------------------------

def analytic_kernel(k: np.ndarray) -> np.ndarray:
    """Kernel for doing direct downsampling of size x4 (bsrgan.py:49-62)."""
    k_size = k.shape[0]
    big = np.zeros((3 * k_size - 2, 3 * k_size - 2))
    for r in range(k_size):
        for c in range(k_size):
            big[2 * r:2 * r + k_size, 2 * c:2 * c + k_size] += k[r, c] * k
    crop = k_size // 2
    cropped = big[crop:crop + k_size, crop:crop + k_size]
    return cropped / cropped.sum()


def gm_blur_kernel(mean, cov, size: int = 15) -> np.ndarray:
    """Normalized Gaussian-pdf grid (bsrgan.py:86-96), vectorized: the
    normalization makes the pdf constant cancel, so evaluate the quadratic
    form directly."""
    center = size / 2.0 + 0.5
    grid = np.arange(size) - center + 1
    cx, cy = np.meshgrid(grid, grid)  # k[y, x] uses (cx, cy) order
    pts = np.stack([cx - mean[0], cy - mean[1]], axis=-1)
    prec = np.linalg.inv(np.asarray(cov, dtype=np.float64))
    quad = np.einsum("yxi,ij,yxj->yx", pts, prec, pts)
    k = np.exp(-0.5 * quad)
    return k / k.sum()


def anisotropic_Gaussian(ksize: int = 15, theta: float = np.pi,
                         l1: float = 6, l2: float = 6) -> np.ndarray:
    """Rotated anisotropic Gaussian kernel (bsrgan.py:65-83)."""
    v = np.array([np.cos(theta), np.sin(theta)])
    V = np.array([[v[0], v[1]], [v[1], -v[0]]])
    D = np.array([[l1, 0.0], [0.0, l2]])
    Sigma = V @ D @ np.linalg.inv(V)
    return gm_blur_kernel(mean=[0, 0], cov=Sigma, size=ksize)


def fspecial_gaussian(hsize: int, sigma: float) -> np.ndarray:
    """MATLAB fspecial('gaussian') (bsrgan.py:187-199)."""
    siz = (hsize - 1) / 2.0
    x, y = np.meshgrid(np.arange(-siz, siz + 1), np.arange(-siz, siz + 1))
    h = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    h[h < np.finfo(float).eps * h.max()] = 0
    s = h.sum()
    return h / s if s != 0 else h


def fspecial_laplacian(alpha: float) -> np.ndarray:
    """MATLAB fspecial('laplacian') (bsrgan.py:201-207)."""
    alpha = max(0.0, min(alpha, 1.0))
    h1, h2 = alpha / (alpha + 1), (1 - alpha) / (alpha + 1)
    return np.array([[h1, h2, h1], [h2, -4 / (alpha + 1), h2], [h1, h2, h1]])


def fspecial(filter_type: str, *args, **kwargs) -> np.ndarray:
    if filter_type == "gaussian":
        return fspecial_gaussian(*args, **kwargs)
    if filter_type == "laplacian":
        return fspecial_laplacian(*args, **kwargs)
    raise ValueError(f"unknown fspecial filter {filter_type!r}")


def shift_pixel(x: np.ndarray, sf: int, upper_left: bool = True) -> np.ndarray:
    """Sub-pixel shift by (sf-1)/2 with bilinear resampling and clamped
    coordinates (bsrgan.py:99-125; rebuilt on map_coordinates — scipy removed
    the interp2d the reference used)."""
    h, w = x.shape[:2]
    shift = (sf - 1) * 0.5 if upper_left else -(sf - 1) * 0.5
    y1 = np.clip(np.arange(h) + shift, 0, h - 1)
    x1 = np.clip(np.arange(w) + shift, 0, w - 1)
    coords = np.meshgrid(y1, x1, indexing="ij")
    if x.ndim == 2:
        return ndimage.map_coordinates(x, coords, order=1, mode="nearest")
    out = np.empty_like(x)
    for c in range(x.shape[-1]):
        out[:, :, c] = ndimage.map_coordinates(x[:, :, c], coords, order=1,
                                               mode="nearest")
    return out


def modcrop_np(img: np.ndarray, sf: int) -> np.ndarray:
    """(bsrgan.py:29-41)"""
    w, h = img.shape[:2]
    return np.copy(img[:w - w % sf, :h - h % sf, ...])


# ---------------------------------------------------------------------------
# deterministic degradation models (bsrgan.py:228-297)
# ---------------------------------------------------------------------------

def bicubic_degradation(x: np.ndarray, sf: int = 3) -> np.ndarray:
    return imresize(x, scale=1 / sf)


def srmd_degradation(x: np.ndarray, k: np.ndarray, sf: int = 3) -> np.ndarray:
    """blur (wrap) then bicubic downsample (bsrgan.py:240-259)."""
    x = ndimage.convolve(x, np.expand_dims(k, axis=2), mode="wrap")
    return bicubic_degradation(x, sf=sf)


def dpsr_degradation(x: np.ndarray, k: np.ndarray, sf: int = 3) -> np.ndarray:
    """bicubic downsample then blur (bsrgan.py:262-281)."""
    x = bicubic_degradation(x, sf=sf)
    return ndimage.convolve(x, np.expand_dims(k, axis=2), mode="wrap")


def classical_degradation(x: np.ndarray, k: np.ndarray,
                          sf: int = 3) -> np.ndarray:
    """blur (wrap) then s-fold nearest downsample (bsrgan.py:284-296)."""
    x = ndimage.convolve(x, np.expand_dims(k, axis=2), mode="wrap")
    return x[0::sf, 0::sf, ...]


def add_sharpening(img: np.ndarray, weight: float = 0.5, radius: int = 50,
                   threshold: int = 10) -> np.ndarray:
    """USM sharpening with a soft blurred mask (bsrgan.py:299-322)."""
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype(np.float32)
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)
    K = np.clip(img + weight * residual, 0, 1)
    return soft_mask * K + (1 - soft_mask) * img


# ---------------------------------------------------------------------------
# stochastic degradation ops (bsrgan.py:325-435; *_light.py deltas noted)
# ---------------------------------------------------------------------------

def add_blur(img: np.ndarray, sf: int = 4, *,
             rng: np.random.Generator | None = None,
             light: bool = False) -> np.ndarray:
    """Random aniso/iso Gaussian blur, mirror boundary (bsrgan.py:325-336;
    light variant divides widths by 4 and uses smaller kernels,
    bsrgan_light.py:327-342)."""
    g = _rng(rng)
    wd2, wd = 4.0 + sf, 2.0 + 0.2 * sf
    if light:
        wd2, wd = wd2 / 4, wd / 4
    if g.random() < 0.5:
        if light:
            ksize = int(g.integers(2, 12)) + 3
        else:
            ksize = 2 * int(g.integers(2, 12)) + 3
        k = anisotropic_Gaussian(ksize=ksize, theta=g.random() * np.pi,
                                 l1=wd2 * g.random(), l2=wd2 * g.random())
    else:
        if light:
            ksize = int(g.integers(2, 5)) + 3       # randint(2, 4)
        else:
            ksize = 2 * int(g.integers(2, 12)) + 3  # randint(2, 11)
        k = fspecial("gaussian", ksize, wd * g.random())
    return ndimage.convolve(img, np.expand_dims(k, axis=2), mode="mirror")


def add_resize(img: np.ndarray, sf: int = 4, *,
               rng: np.random.Generator | None = None) -> np.ndarray:
    """Random up/down/none resize (bsrgan.py:339-350)."""
    g = _rng(rng)
    rnum = g.random()
    if rnum > 0.8:
        sf1 = g.uniform(1, 2)
    elif rnum < 0.7:
        sf1 = g.uniform(0.5 / sf, 1)
    else:
        sf1 = 1.0
    img = cv2.resize(img, (int(sf1 * img.shape[1]), int(sf1 * img.shape[0])),
                     interpolation=int(g.choice(_CV2_INTERPS)))
    return np.clip(img, 0.0, 1.0)


def _covariance_noise(g: np.random.Generator, shape2d, L: float) -> np.ndarray:
    """Correlated per-channel noise via a random orthogonal mixing
    (bsrgan.py:380-383)."""
    from scipy.linalg import orth

    D = np.diag(g.random(3))
    U = orth(g.random((3, 3)))
    conv = U.T @ D @ U
    return g.multivariate_normal([0, 0, 0], np.abs(L ** 2 * conv),
                                 shape2d).astype(np.float32)


def add_Gaussian_noise(img: np.ndarray, noise_level1: int = 2,
                       noise_level2: int = 25, *,
                       rng: np.random.Generator | None = None) -> np.ndarray:
    """Color / grayscale / channel-correlated Gaussian noise
    (bsrgan.py:369-385)."""
    g = _rng(rng)
    noise_level = int(g.integers(noise_level1, noise_level2 + 1))
    rnum = g.random()
    if rnum > 0.6:
        img = img + g.normal(0, noise_level / 255.0,
                             img.shape).astype(np.float32)
    elif rnum < 0.4:
        img = img + g.normal(0, noise_level / 255.0,
                             (*img.shape[:2], 1)).astype(np.float32)
    else:
        img = img + _covariance_noise(g, img.shape[:2], noise_level2 / 255.0)
    return np.clip(img, 0.0, 1.0)


def add_speckle_noise(img: np.ndarray, noise_level1: int = 2,
                      noise_level2: int = 25, *,
                      rng: np.random.Generator | None = None) -> np.ndarray:
    """Multiplicative (signal-proportional) noise (bsrgan.py:388-404)."""
    g = _rng(rng)
    noise_level = int(g.integers(noise_level1, noise_level2 + 1))
    img = np.clip(img, 0.0, 1.0)
    rnum = g.random()
    if rnum > 0.6:
        img += img * g.normal(0, noise_level / 255.0,
                              img.shape).astype(np.float32)
    elif rnum < 0.4:
        img += img * g.normal(0, noise_level / 255.0,
                              (*img.shape[:2], 1)).astype(np.float32)
    else:
        img += img * _covariance_noise(g, img.shape[:2], noise_level2 / 255.0)
    return np.clip(img, 0.0, 1.0)


def add_Poisson_noise(img: np.ndarray, *,
                      rng: np.random.Generator | None = None) -> np.ndarray:
    """Shot noise at a random exposure, color or luma-only
    (bsrgan.py:404-415)."""
    g = _rng(rng)
    img = np.clip((img * 255.0).round(), 0, 255) / 255.0
    vals = 10 ** (2 * g.random() + 2.0)
    if g.random() < 0.5:
        img = g.poisson(img * vals).astype(np.float32) / vals
    else:
        img_gray = np.dot(img[..., :3], [0.299, 0.587, 0.114])
        img_gray = np.clip((img_gray * 255.0).round(), 0, 255) / 255.0
        noise_gray = g.poisson(img_gray * vals).astype(np.float32) / vals \
            - img_gray
        img = img + noise_gray[:, :, np.newaxis]
    return np.clip(img, 0.0, 1.0)


def add_JPEG_noise(img: np.ndarray, *,
                   rng: np.random.Generator | None = None,
                   quality_factor: int | None = None) -> np.ndarray:
    """Round-trip through a random-quality JPEG (bsrgan.py:418-424).
    ``quality_factor`` pins the quality for deterministic use/tests."""
    g = _rng(rng)
    if quality_factor is None:
        quality_factor = int(g.integers(30, 96))
    bgr = cv2.cvtColor(single2uint(img), cv2.COLOR_RGB2BGR)
    _, enc = cv2.imencode(".jpg", bgr,
                          [int(cv2.IMWRITE_JPEG_QUALITY), quality_factor])
    dec = cv2.imdecode(enc, 1)
    return cv2.cvtColor(uint2single(dec), cv2.COLOR_BGR2RGB)


def random_crop(lq: np.ndarray, hq: np.ndarray, sf: int = 4,
                lq_patchsize: int = 64, *,
                rng: np.random.Generator | None = None):
    """Aligned random lq/hq crop pair (bsrgan.py:427-435)."""
    g = _rng(rng)
    h, w = lq.shape[:2]
    rnd_h = int(g.integers(0, h - lq_patchsize + 1))
    rnd_w = int(g.integers(0, w - lq_patchsize + 1))
    lq = lq[rnd_h:rnd_h + lq_patchsize, rnd_w:rnd_w + lq_patchsize, :]
    rh, rw = int(rnd_h * sf), int(rnd_w * sf)
    hq = hq[rh:rh + lq_patchsize * sf, rw:rw + lq_patchsize * sf, :]
    return lq, hq


# ---------------------------------------------------------------------------
# full pipelines (bsrgan.py:438-730, bsrgan_light.py:389-475)
# ---------------------------------------------------------------------------

def _shuffle_order(g: np.random.Generator) -> list[int]:
    """random.sample(range(7), 7) with downsample3 forced after downsample2
    (bsrgan.py:561-564)."""
    order = list(g.permutation(7))
    i2, i3 = order.index(2), order.index(3)
    if i2 > i3:
        order[i2], order[i3] = order[i3], order[i2]
    return order


def _maybe_downsample1(img: np.ndarray, sf: int,
                       g: np.random.Generator) -> tuple[np.ndarray, int]:
    """The sf==4 pre-halving branch (bsrgan.py:553-559)."""
    if sf == 4 and g.random() < 0.25:
        if g.random() < 0.5:
            img = cv2.resize(img, (img.shape[1] // 2, img.shape[0] // 2),
                             interpolation=int(g.choice(_CV2_INTERPS)))
        else:
            img = imresize(img, 1 / 2, True)
        return np.clip(img, 0.0, 1.0), 2
    return img, sf


def _downsample2(img: np.ndarray, sf: int, g: np.random.Generator,
                 light: bool) -> np.ndarray:
    """Random-factor resize or shifted-kernel blur + s-fold decimation
    (bsrgan.py:577-588; light uses p=0.8, bsrgan_light.py:438)."""
    if g.random() < (0.8 if light else 0.75):
        sf1 = g.uniform(1, 2 * sf)
        img = cv2.resize(img, (int(1 / sf1 * img.shape[1]),
                               int(1 / sf1 * img.shape[0])),
                         interpolation=int(g.choice(_CV2_INTERPS)))
    else:
        k = fspecial("gaussian", 25, g.uniform(0.1, 0.6 * sf))
        k_shifted = shift_pixel(k, sf)
        k_shifted = k_shifted / k_shifted.sum()
        img = ndimage.convolve(img, np.expand_dims(k_shifted, axis=2),
                               mode="mirror")
        img = img[0::sf, 0::sf, ...]
    return np.clip(img, 0.0, 1.0)


def degradation_bsrgan(img: np.ndarray, sf: int = 4, lq_patchsize: int = 72,
                       isp_model=None, *,
                       rng: np.random.Generator | None = None):
    """Paired (lq, hq) BSRGAN degradation (bsrgan.py:438-527). ``img`` is
    HWC float [0,1]; the isp branch is dead in the reference too (no
    isp_model is ever passed) and is omitted."""
    g = _rng(rng)
    sf_ori = sf
    h1, w1 = img.shape[:2]
    img = modcrop_np(img, sf)
    h, w = img.shape[:2]
    if h < lq_patchsize * sf or w < lq_patchsize * sf:
        raise ValueError(f"img size ({h1}X{w1}) is too small!")
    hq = img.copy()
    img, sf = _maybe_downsample1(img, sf, g)

    for i in _shuffle_order(g):
        if i in (0, 1):
            img = add_blur(img, sf=sf, rng=g)
        elif i == 2:
            a, b = img.shape[1], img.shape[0]
            img = _downsample2(img, sf, g, light=False)
        elif i == 3:
            img = cv2.resize(img, (int(1 / sf * a), int(1 / sf * b)),
                             interpolation=int(g.choice(_CV2_INTERPS)))
            img = np.clip(img, 0.0, 1.0)
        elif i == 4:
            img = add_Gaussian_noise(img, 2, 25, rng=g)
        elif i == 5:
            if g.random() < 0.9:
                img = add_JPEG_noise(img, rng=g)
        # i == 6: camera ISP branch — dead in the reference (no model passed)

    img = add_JPEG_noise(img, rng=g)
    return random_crop(img, hq, sf_ori, lq_patchsize, rng=g)


def degradation_bsrgan_variant(image: np.ndarray, sf: int = 4,
                               isp_model=None, *, light: bool = False,
                               rng: np.random.Generator | None = None) -> dict:
    """The exported crop-free variant (bsrgan.py:530-616 /
    bsrgan_light.py:389-475): uint8 HWC in -> ``{"image": uint8 lq}``.
    ``light=True`` selects the softer bsrgan_light parameters (single blur
    pass, gentler kernels, noise levels 1-2)."""
    g = _rng(rng)
    image = uint2single(image)
    h1, w1 = image.shape[:2]
    # the reference mod-crops with transposed h/w — reproduced as-is
    image = image.copy()[:w1 - w1 % sf, :h1 - h1 % sf, ...]
    image, sf = _maybe_downsample1(image, sf, g)

    for i in _shuffle_order(g):
        if i == 0:
            image = add_blur(image, sf=sf, rng=g, light=light)
        elif i == 1:
            if not light:  # light comments out the second blur
                image = add_blur(image, sf=sf, rng=g, light=light)
        elif i == 2:
            a, b = image.shape[1], image.shape[0]
            image = _downsample2(image, sf, g, light=light)
        elif i == 3:
            image = cv2.resize(image, (int(1 / sf * a), int(1 / sf * b)),
                               interpolation=int(g.choice(_CV2_INTERPS)))
            image = np.clip(image, 0.0, 1.0)
        elif i == 4:
            lo, hi = (1, 2) if light else (2, 25)
            image = add_Gaussian_noise(image, lo, hi, rng=g)
        elif i == 5:
            if g.random() < 0.9:
                image = add_JPEG_noise(image, rng=g)

    image = add_JPEG_noise(image, rng=g)
    return {"image": single2uint(image)}


def degradation_bsrgan_plus(img: np.ndarray, sf: int = 4,
                            shuffle_prob: float = 0.5, use_sharp: bool = True,
                            lq_patchsize: int = 64, isp_model=None, *,
                            rng: np.random.Generator | None = None):
    """BSRGAN+Real-ESRGAN combined two-stage model (bsrgan.py:617-726)."""
    g = _rng(rng)
    img = modcrop_np(img, sf)
    h, w = img.shape[:2]
    if h < lq_patchsize * sf or w < lq_patchsize * sf:
        raise ValueError(f"img size ({h}X{w}) is too small!")
    if use_sharp:
        img = add_sharpening(img)
    hq = img.copy()

    if g.random() < shuffle_prob:
        order = list(g.permutation(13))
    else:
        order = list(range(13))
        order[2:6] = list(g.permutation(order[2:6]))
        order[9:13] = list(g.permutation(order[9:13]))

    poisson_prob = speckle_prob = 0.1
    for i in order:
        if i in (0, 7):
            img = add_blur(img, sf=sf, rng=g)
        elif i in (1, 8):
            img = add_resize(img, sf=sf, rng=g)
        elif i in (2, 9):
            img = add_Gaussian_noise(img, 2, 25, rng=g)
        elif i in (3, 10):
            if g.random() < poisson_prob:
                img = add_Poisson_noise(img, rng=g)
        elif i in (4, 11):
            if g.random() < speckle_prob:
                img = add_speckle_noise(img, rng=g)
        elif i == 6:
            img = add_JPEG_noise(img, rng=g)
        # i in (5, 12): camera ISP branch — dead in the reference

    img = cv2.resize(img, (int(1 / sf * hq.shape[1]),
                           int(1 / sf * hq.shape[0])),
                     interpolation=int(g.choice(_CV2_INTERPS)))
    img = add_JPEG_noise(img, rng=g)
    return random_crop(img, hq, sf, lq_patchsize, rng=g)


# the reference package's public exports (__init__.py:1-2)
degradation_fn_bsr = partial(degradation_bsrgan_variant, light=False)
degradation_fn_bsr_light = partial(degradation_bsrgan_variant, light=True)
