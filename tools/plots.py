#!/usr/bin/env python3
"""Benchmark plot-script emitter — the analogue of the reference's
``Plotting/*.gp`` gnuplot scripts (``Error_plot.gp``,
``RHS_atomsVswalltime.gp``, ``atomsVswalltime.gp``, ``ncells_per_atom.gp``).

Consumes the ``.dat`` tables written by ``tools/rc_sweep.py`` and
``tools/bench_scaling.py`` (same column layout as the reference's
``Plotting/*.dat``) and writes both gnuplot scripts (drop-in for the
reference's plotting flow) and, when matplotlib is importable, PNGs
directly.

Usage: python tools/plots.py [--dir Plotting] [--png]
"""

import argparse
import os
import sys

GP_SCRIPTS = {
    # name -> (title, xlabel, ylabel, plot line(s))
    "atomsVswalltime.gp": (
        "Number of atoms Vs Wallclock time in seconds",
        "Number of atoms", "Wall clock time in seconds",
        "plot 'atoms_Vs_walltime.dat' using 1:2 with linespoints "
        "title 'reference (20 ranks)', \\\n"
        "     'atoms_Vs_walltime.dat' using 1:3 with linespoints "
        "title 'this framework', \\\n"
        "     'atoms_Vs_walltime.dat' using 1:($2/$2*column(2)) "
        "with lines dt 2 title 'linear scaling'"),
    "RHS_atomsVswalltime.gp": (
        "Number of atoms Vs Wallclock time for RHS assembly in seconds",
        "Number of atoms", "RHS Assembly Wall clock time in seconds",
        "plot for [c=2:4] 'RHS_assembly_atoms_Vs_walltime.dat' "
        "using 1:c with lines title columnheader"),
    "Error_plot.gp": (
        "Error in charge densities vs cutoff radius",
        "Cutoff radius for gaussian charges",
        "Absolute Error in total charge density",
        "plot for [c=2:3] 'Total_charge_density_AbsErr_L2.dat' "
        "using 1:c with lines title columnheader"),
    "ncells_per_atom.gp": (
        "Number of active cells per refinement cycle",
        "Number of atoms", "Number of active cells",
        "plot for [c=2:6] 'ncells_per_atom.dat' using 1:c "
        "with linespoints title columnheader"),
}


def emit_gnuplot(outdir: str) -> list:
    os.makedirs(outdir, exist_ok=True)
    written = []
    for name, (title, xl, yl, plot) in GP_SCRIPTS.items():
        path = os.path.join(outdir, name)
        with open(path, "w") as f:
            f.write(
                "# Gnuplot script (emitted by tools/plots.py; mirrors the\n"
                f"# reference's Plotting/{name})\n"
                "set autoscale\n"
                f'set title "{title}"\n'
                f'set xlabel "{xl}"\n'
                f'set ylabel "{yl}"\n'
                "set key outside\n"
                f"{plot}\n")
        written.append(path)
    return written


def emit_png(outdir: str) -> list:
    """Render whatever .dat tables exist into PNGs (matplotlib)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np
    except Exception:
        return []
    written = []
    for dat, title in [
            ("atoms_Vs_walltime.dat", "atoms vs walltime"),
            ("RHS_assembly_atoms_Vs_walltime.dat", "RHS assembly walltime"),
            ("Total_charge_density_AbsErr_L2.dat", "charge error vs cutoff"),
            ("ncells_per_atom.dat", "cells per cycle")]:
        path = os.path.join(outdir, dat)
        if not os.path.exists(path):
            continue
        rows = []
        header = None
        for ln in open(path):
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            parts = ln.split()
            try:
                rows.append([float(p) for p in parts])
            except ValueError:
                header = parts
        if not rows:
            continue
        arr = np.array(rows)
        fig, ax = plt.subplots(figsize=(6, 4))
        for c in range(1, arr.shape[1]):
            lbl = header[c] if header and c < len(header) else f"col{c}"
            ax.plot(arr[:, 0], arr[:, c], marker="o", label=lbl)
        ax.set_title(title)
        ax.set_xscale("log")
        ax.legend(fontsize=7)
        out = path.replace(".dat", ".png")
        fig.savefig(out, dpi=110, bbox_inches="tight")
        plt.close(fig)
        written.append(out)
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="Plotting")
    ap.add_argument("--png", action="store_true")
    args = ap.parse_args()
    written = emit_gnuplot(args.dir)
    if args.png:
        written += emit_png(args.dir)
    for w in written:
        print(w)


if __name__ == "__main__":
    main()
