from . import collision, eos, lattice, stencil, streaming  # noqa: F401
from .lattice import D2Q9, D3Q19, D2Q9_REST_FIRST, Lattice  # noqa: F401
