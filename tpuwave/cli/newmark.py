"""``tpuwave-newmark`` — the main-newmark equivalent (reference src/main-newmark.cpp)."""

from __future__ import annotations

import sys

from tpuwave.cli._common import run_main
from tpuwave.models.newmark import NewmarkSolver


def main(argv=None) -> int:
    return run_main("newmark",
                    lambda disc, **kw: NewmarkSolver(disc, **kw), argv)


if __name__ == "__main__":
    sys.exit(main())
