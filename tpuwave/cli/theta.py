"""``tpuwave-theta`` — the main-theta equivalent (reference src/main-theta.cpp)."""

from __future__ import annotations

import sys

from tpuwave.cli._common import run_main
from tpuwave.models.theta import ThetaSolver


def main(argv=None) -> int:
    return run_main("theta",
                    lambda disc, **kw: ThetaSolver(disc, **kw), argv)


if __name__ == "__main__":
    sys.exit(main())
