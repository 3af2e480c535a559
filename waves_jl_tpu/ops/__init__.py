from . import fd, metrics, pml
