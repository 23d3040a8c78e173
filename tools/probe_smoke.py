"""Run a hardware probe script on CPU to catch crashes before it burns a
relay session (first TPU compile on the relay costs 4-25 min, so a typo
discovered on hardware wastes most of a session).

Forces JAX_PLATFORMS=cpu and monkeypatches ``pl.pallas_call`` into
interpret mode (stripping TPU compiler params, mirroring what the package
itself does when constructed with ``interpret=True``).  Shrink shapes via
the probes' H2R_PROBE_* knobs, e.g.::

    H2R_PROBE_B=4096 H2R_PROBE_L=256 H2R_PROBE_L64=1024 \
        python tools/probe_smoke.py tools/probe_tpu57.py

Timings printed under the smoke run are meaningless; only completion
without a Python/trace error matters.
"""

import os
import runpy
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The TPU-attached sitecustomize hook forces its platform even against
# JAX_PLATFORMS=cpu; the config update after import wins.
jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl  # noqa: E402

_orig_pallas_call = pl.pallas_call


def _interp_pallas_call(*args, **kw):
    kw["interpret"] = True
    kw.pop("compiler_params", None)
    return _orig_pallas_call(*args, **kw)


pl.pallas_call = _interp_pallas_call

if __name__ == "__main__":
    sys.argv = sys.argv[1:]
    runpy.run_path(sys.argv[0], run_name="__main__")
