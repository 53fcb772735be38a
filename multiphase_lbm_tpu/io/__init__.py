from . import config, loggers, vtk  # noqa: F401
