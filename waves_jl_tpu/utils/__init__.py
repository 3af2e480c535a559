from . import gaussians, interp, trees
