"""Offline render entry point: `python -m ingp_tpu.render_cli --config ...`

Equivalent of the reference's render.py __main__ (render.py:220-222).
"""
from __future__ import annotations

from .training.config import get_opts
from .render.offline import render_for_test


def main(argv=None):
    hparams = get_opts(argv)
    out = render_for_test(hparams)
    print(f"wrote renders to {out}")


if __name__ == "__main__":
    main()
