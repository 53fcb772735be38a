from . import checkpoint, config, loggers, vtk  # noqa: F401
