"""Shared driver plumbing: output cadence, VTK/dat emission, MLUPS report."""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..io.loggers import DatLogger, MlupsClock
from ..io.vtk import VtkWriter, sol_filename


class Driver:
    """Replicates the reference drivers' loop skeleton: periodic VTK dumps,
    periodic stdout + .dat logging, end-of-run MLUPS line (e.g.
    laplace2D.h:485-511)."""

    def __init__(self, outdir, nelem, out_freq=0, vtk_freq=0):
        self.outdir = Path(outdir)
        self.outdir.mkdir(parents=True, exist_ok=True)
        self.out_freq = out_freq
        self.vtk_freq = vtk_freq
        self.clock = MlupsClock(nelem)
        self._logs = {}

    def log_file(self, name) -> DatLogger:
        if name not in self._logs:
            self._logs[name] = DatLogger(self.outdir / name)
        return self._logs[name]

    def want_vtk(self, it) -> bool:
        return self.vtk_freq != 0 and it % self.vtk_freq == 0

    def want_out(self, it) -> bool:
        return self.out_freq != 0 and it % self.out_freq == 0

    def write_vtk(self, it, nx, ny, nz=1, spacing=1.0, scalars=(), vectors=(),
                  int_scalars=()):
        w = VtkWriter(nx, ny, nz, spacing=spacing, iteration=it)
        for name, data in scalars:
            w.scalar(name, np.asarray(data))
        for name, data in vectors:
            w.vector(name, np.asarray(data))
        for name, data in int_scalars:
            w.scalar(name, np.asarray(data), as_int=True)
        w.write(self.outdir / sol_filename(it))

    def finish(self):
        for lg in self._logs.values():
            lg.close()
        print(self.clock.report())
        return self.clock.mlups


def next_chunk(it, steps, *freqs):
    """Steps to advance from ``it`` so the loop lands exactly on the next
    diagnostic event: the smallest distance to a multiple of any nonzero
    cadence, bounded by the end of the run.  A fixed stride of one cadence
    silently skips the other's instants whenever they aren't multiples of
    each other (e.g. out_freq=400, vtk_freq=1000 → dumps at 1000/3000
    never land)."""
    dists = [f - it % f for f in freqs if f]
    return max(1, min([steps - it] + dists))
