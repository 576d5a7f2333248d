from . import cameras, projections
