"""Plot digitization: scatter/curve images -> point series.

Reimplements the reference's plot-processing chain
(``/root/reference/plot_processing/PlotProcessing.ipynb`` cells 0-7:
gray -> blur -> Otsu threshold -> contours -> DBSCAN point clustering ->
SVR/GPR curve fit) as pure NumPy: box blur, Otsu's method, 8-connected
component centroids, epsilon-ball cluster merge, and a least-squares
polynomial fit standing in for the sklearn regressors (sklearn absent in
sandbox; the ``svr``/``gpr`` backends are gated). Axis-label OCR
(pytesseract in the reference) is out of scope — coordinates are in pixel
space, the caller applies axis calibration.

Per-image and pure: inside the engine this runs as a stateless
``map_batches`` stage over plot-region crops (the 'plot' class of the
reference's table/plot detector, maskrcnn/class_names.py:2-6).
"""

from __future__ import annotations

import numpy as np

from .geometry import _label_components


def box_blur(img: np.ndarray, radius: int = 1) -> np.ndarray:
    """Separable box blur via cumulative sums (uint8 in/out)."""
    if radius <= 0:
        return img
    k = 2 * radius + 1
    padded = np.pad(img.astype(np.float64), radius, mode="edge")
    c = np.cumsum(padded, axis=0)
    v = (c[k - 1 :] - np.concatenate([np.zeros((1, c.shape[1])), c[: -k ]], axis=0))
    c2 = np.cumsum(v, axis=1)
    h = (c2[:, k - 1 :] - np.concatenate([np.zeros((c2.shape[0], 1)), c2[:, :-k]], axis=1))
    return np.clip(h / (k * k), 0, 255).astype(np.uint8)


def otsu_threshold(img: np.ndarray) -> int:
    """Otsu's between-class-variance-maximizing threshold on a uint8
    grayscale image."""
    hist = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 127
    omega = np.cumsum(hist) / total
    mu = np.cumsum(hist * np.arange(256)) / total
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = np.where(denom > 0, (mu_t * omega - mu) ** 2 / denom, 0.0)
    return int(np.argmax(sigma_b))


def extract_points(
    img: np.ndarray, blur_radius: int = 1, eps: float = 5.0, min_area: int = 2
) -> list[tuple[float, float]]:
    """Dark-marker centroids of a plot image, DBSCAN-style epsilon-merged,
    sorted by (x, y). Pixel coordinates, y down."""
    blurred = box_blur(img, blur_radius)
    thresh = otsu_threshold(blurred)
    mask = blurred <= thresh
    labels, n = _label_components(mask)
    pts: list[tuple[float, float]] = []
    for lbl in range(1, n + 1):
        ys, xs = np.nonzero(labels == lbl)
        if len(xs) < min_area:
            continue
        pts.append((float(xs.mean()), float(ys.mean())))
    return sorted(_merge_eps(pts, eps))


def _merge_eps(pts: list[tuple[float, float]], eps: float) -> list[tuple[float, float]]:
    """Greedy epsilon-ball clustering (DBSCAN stand-in): points within eps
    of a cluster mean join it; cluster centroid is the member mean."""
    clusters: list[list[tuple[float, float]]] = []
    for p in sorted(pts):
        for c in clusters:
            cx = sum(q[0] for q in c) / len(c)
            cy = sum(q[1] for q in c) / len(c)
            if (p[0] - cx) ** 2 + (p[1] - cy) ** 2 <= eps * eps:
                c.append(p)
                break
        else:
            clusters.append([p])
    return [
        (sum(q[0] for q in c) / len(c), sum(q[1] for q in c) / len(c))
        for c in clusters
    ]


def fit_curve(
    points: list[tuple[float, float]], degree: int = 3, backend: str = "polyfit"
) -> np.ndarray:
    """Least-squares polynomial coefficients (highest degree first) through
    the digitized points. ``svr``/``gpr`` mirror the reference's sklearn
    regressors and are gated until sklearn is available."""
    if backend != "polyfit":  # pragma: no cover - sklearn absent in sandbox
        raise NotImplementedError(
            f"curve-fit backend {backend!r} requires scikit-learn "
            "(reference PlotProcessing.ipynb cells 5-7); sandbox uses "
            "'polyfit'"
        )
    if len(points) == 0:
        return np.zeros(degree + 1)
    xs = np.asarray([p[0] for p in points])
    ys = np.asarray([p[1] for p in points])
    deg = min(degree, max(0, len(points) - 1))
    coef = np.polyfit(xs, ys, deg)
    return np.concatenate([np.zeros(degree + 1 - len(coef)), coef])


def digitize_plot(img: np.ndarray, degree: int = 3) -> dict:
    """Full chain: points + fitted polynomial for one plot image."""
    pts = extract_points(img)
    return {"points": pts, "coeffs": fit_curve(pts, degree=degree).tolist()}
