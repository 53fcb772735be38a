from . import adjoint, profiling  # noqa: F401
