from .ivf import IvfReader, IvfWriter, is_ivf
