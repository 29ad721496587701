from xtddft_tpu.chem.molecule import Molecule
from xtddft_tpu.chem import elements, geometries

__all__ = ["Molecule", "elements", "geometries"]
