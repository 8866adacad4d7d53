#!/usr/bin/env python3
"""Generate the 12 benchmark parameter presets into parameters/.

These reproduce, case by case, the physics of the reference presets
(/root/reference/parameters/*.json, schema documented in the reference
README.md:133-155): same domain, mesh, scheme parameters and mathematical
expressions, so runs are comparable 1:1 with the reference solver.
"""

from __future__ import annotations

import json
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "parameters"


def fn(expr, variables="x, y, t", constants=""):
    return {
        "Function constants": constants,
        "Function expression": expr,
        "Variable names": variables,
    }


def preset(name, *, geometry="[0.0, 1.0] x [0.0, 1.0]", nel, r="1", t, theta="0.5",
           beta="0.25", gamma="0.5", dt, c="1.0", f="0.0", f_const="",
           u0="0.0", u0_const="", v0="0.0", v0_const="", g="0.0", g_const="",
           dgdt="0.0", dgdt_const="", solution=None, solution_const=""):
    data = {
        "Geometry": geometry,
        "Nel": nel,
        "R": r,
        "T": t,
        "Theta": theta,
        "Beta": beta,
        "Gamma": gamma,
        "Dt": dt,
        "C": fn(c),
        "F": fn(f, constants=f_const),
        "U0": fn(u0, "x, y", u0_const),
        "V0": fn(v0, "x, y", v0_const),
        "G": fn(g, constants=g_const),
        "DGDT": fn(dgdt, constants=dgdt_const),
    }
    if solution is not None:
        data["Solution"] = fn(solution, constants=solution_const)
    return name, data


MEMBRANE_G_CONST = "TT=0.5, XX=0.5, ya=0.333, yb=0.666, k=4.0*pi"

PRESETS = dict([
    preset(
        "sine-membrane",
        geometry="[0.0, 3.0] x [0.0, 1.0]", nel="180, 60", t="60.0", dt="0.05",
        g="if(t<=TT && x<XX && y>ya && y<yb, sin(k*t), 0.0)",
        g_const=MEMBRANE_G_CONST,
        dgdt="if(t<=TT && x<XX && y>ya && y<yb, cos(k*t)*k, 0.0)",
        dgdt_const=MEMBRANE_G_CONST,
    ),
    preset(
        "sine-membrane-likedeal2",
        geometry="[-1.0, 1.0] x [-1.0, 1.0]", nel="128", t="5.0", dt="0.015625",
        g="if(t<=TT && x<XX && y>ya && y<yb, sin(k*t), 0.0)",
        g_const="TT=0.5, XX=0.0, ya=-0.333, yb=0.333, k=4.0*pi",
        dgdt="if(t<=TT && x<XX && y>ya && y<yb, cos(k*t)*k, 0.0)",
        dgdt_const="TT=0.5, XX=0.0, ya=-0.333, yb=0.333, k=4.0*pi",
    ),
    preset(
        "standing-mode-wsol",
        nel="80", t="60.0", theta="0.0", dt="0.01",
        u0="sin(pi*x)*sin(pi*y)",
        solution="cos(sqrt(2)*pi*t)*sin(pi*x)*sin(pi*y)",
    ),
    preset(
        "two-modes-wsol",
        nel="160", t="2.0", dt="0.0035",
        u0="A1*sin(pi*x)*sin(2*pi*y) + A2*sin(2*pi*x)*sin(pi*y)",
        u0_const="A1=1.0, A2=0.7",
        v0_const="A1=1.0, A2=0.7",
        solution=("A1*cos(pi*sqrt(5)*t)*sin(pi*x)*sin(2*pi*y) + "
                  "A2*cos(pi*sqrt(5)*t)*sin(2*pi*x)*sin(pi*y)"),
        solution_const="A1=1.0, A2=0.7",
    ),
    preset(
        "five-modes-wsol",
        nel="160", t="12.0", dt="0.00250",
        u0=("0.2*sin(pi*x)*sin(pi*y) + 0.15*sin(2*pi*x)*sin(pi*y) + "
            "0.1*sin(pi*x)*sin(2*pi*y) + 0.08*sin(2*pi*x)*sin(2*pi*y) + "
            "0.05*sin(3*pi*x)*sin(pi*y)"),
        solution=("0.2*cos(sqrt(2)*pi*t)*sin(pi*x)*sin(pi*y) + "
                  "0.15*cos(sqrt(5)*pi*t)*sin(2*pi*x)*sin(pi*y) + "
                  "0.1*cos(sqrt(5)*pi*t)*sin(pi*x)*sin(2*pi*y) + "
                  "0.08*cos(2*sqrt(2)*pi*t)*sin(2*pi*x)*sin(2*pi*y) + "
                  "0.05*cos(sqrt(10)*pi*t)*sin(3*pi*x)*sin(pi*y)"),
    ),
    preset(
        "dumping-wave",
        nel="160", t="3.0", dt="0.00350",
        f=("exp(-0.1*t)*sin(pi*x)*sin(pi*y)*(0.01*cos(sqrt(2)*pi*t) + "
           "0.8886*sin(sqrt(2)*pi*t))"),
        u0="0.2*sin(pi*x)*sin(pi*y)",
        solution="0.2*exp(-0.1*t)*cos(sqrt(2)*pi*t)*sin(pi*x)*sin(pi*y)",
    ),
    preset(
        "gaussian-pulse",
        nel="80", t="1.2", dt="0.0025",
        u0="exp(-alpha*((x-x0)^2 + (y-y0)^2))",
        u0_const="alpha=2000, x0=0.3, y0=0.5",
    ),
    preset(
        "ricker-wavelet",
        nel="100", t="2.0", dt="0.0035",
        f=("((1 - 2*(pi*f0*(t - 1/f0))^2) * exp(-(pi*f0*(t - 1/f0))^2)) * "
           "exp(-((x-xs)^2 + (y-ys)^2) / (2*sigma^2))"),
        f_const="xs=0.5, ys=0.5, f0=20.0, sigma=0.01",
    ),
    preset(
        "square-pulsing",
        nel="80", t="2.0", dt="0.0035",
        f="if(sin(2*pi*f*t) > 0, exp(-((x-xs)^2 + (y-ys)^2) / (2*sigma^2)), 0.0)",
        f_const="xs=0.5, ys=0.5, sigma=0.015, f=5.0",
    ),
    preset(
        "oscillating-boundary",
        nel="80", t="3.0", dt="0.005",
        g="if(x<0.1 && 0<=y && y<=1, sin(6*pi*t), 0.0)",
        dgdt="if(x<0.1 && 0<=y && y<=1, cos(6*pi*t)*6*pi, 0.0)",
    ),
    preset(
        "square-bump",
        nel="120", t="60.0", dt="0.01",
        u0=("A*0.25*(tanh((x - xL)/eps) - tanh((x - xR)/eps))*"
            "(tanh((y - yB)/eps) - tanh((y - yT)/eps))"),
        u0_const="xL=0.15, xR=0.25, yB=0.4, yT=0.6, A=1.0, eps=0.01",
        v0=("-A*0.25*((2/(exp((x - xL)/eps)+exp(-(x - xL)/eps))^2 - "
            "(2/(exp((x - xR)/eps)+exp(-(x - xR)/eps))^2))/eps *"
            "(tanh((y - yB)/eps) - tanh((y - yT)/eps)))"),
        v0_const="xL=0.15, xR=0.25, yB=0.4, yT=0.6, A=1.0, eps=0.01",
    ),
    preset(
        "traveling-square-bump",
        geometry="[0.0, 3.0] x [0.0, 3.0]", nel="180, 60", t="5.0", dt="0.015625",
        u0="A*0.5*(tanh(x/eps) - tanh((x - w)/eps))",
        u0_const="eps=0.0075, T=0.7, w=0.2, A=1.0",
        v0="-c*A*0.5*(1/(cosh(x/eps)^2) - 1/(cosh((x - w)/eps)^2))",
        v0_const="eps=0.0075, T=0.7, w=0.2, A=1.0, c=1.0",
    ),
])


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, data in PRESETS.items():
        path = OUT / f"{name}.json"
        path.write_text(json.dumps(data, indent=2) + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
