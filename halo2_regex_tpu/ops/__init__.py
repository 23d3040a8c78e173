"""Scan backends.

``best_matcher`` picks the fastest backend a model supports:
bit-sliced bitplane pipeline (small DFAs, TPU) > fused split Pallas
kernels (any DFA, TPU) > portable XLA scan.
"""

from __future__ import annotations


def best_matcher(model, backend: str = "auto", **kwargs):
    """Return ``(matcher, backend_name)``.

    ``backend``: "auto" | "bitplane" | "pallas" | "xla".  Auto tries the
    TPU backends in speed order and falls back on any constructor error
    (e.g. a model whose synthesized circuit exceeds the bitplane budget).
    ``kwargs`` are forwarded to the chosen matcher's constructor.
    """
    import jax

    from .scan_jax import BatchMatcher

    on_tpu = jax.devices()[0].platform == "tpu"
    if backend == "auto":
        candidates = ("bitplane", "pallas", "xla") if on_tpu else ("xla",)
    else:
        candidates = (backend,)
    last: Exception | None = None
    for name in candidates:
        try:
            if name == "bitplane":
                from .bitplane import BitplaneMatcher

                kw = dict(kwargs)
                if not on_tpu:
                    # explicit bitplane request off-TPU: interpret-mode
                    # kernels (correct, slow) instead of a Mosaic
                    # lowering failure at first call
                    kw.setdefault("interpret", True)
                return BitplaneMatcher(model, **kw), "bitplane"
            if name == "pallas":
                from .pallas_scan import PallasMatcher

                kw = {k: v for k, v in kwargs.items() if k != "columns"}
                if not on_tpu:
                    kw.setdefault("interpret", True)
                return PallasMatcher(model, **kw), "pallas"
            if name == "xla":
                return BatchMatcher(model), "xla"
            raise ValueError(f"unknown backend {name!r}")
        except Exception as e:  # fall through the ladder
            last = e
    raise last  # every candidate failed
