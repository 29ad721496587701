"""Named molecular geometries used by tests and examples.

Replaces the reference's molecule library (`/root/reference/xtddft/utils/atom.py`).
All geometries are Cartesian, in Angstrom, matching the coordinates the
reference's golden-test examples are run on:

- ``n2``          — example/TDA.ipynb cell 2 (`utils/atom.py:2814-2817`)
- ``ch2o_vacuum`` — [CH2O]+ radical, example/TDA.ipynb cells 4/6 (`utils/atom.py:36-41`)
- ``fh``          — FH triplet, example/XSF_TDA.ipynb cell 1
- ``be``          — Be atom, `xtddft/XSF_TDA.py:1558-1566` hardcoded reference
"""

n2 = """
    N  0.00000000 0.00000000 -0.55899578
    N  0.00000000 0.00000000 0.55899578
"""

# [CH2O]^+ radical cation
ch2o_vacuum = """
    C  0.000000    0.526270    0.000000
    H  0.979180    1.091955    0.000000
    H -0.979175    1.091979    0.000000
    O  0.000000   -0.667694    0.000000
"""

# FH at 1.0 Angstrom (triplet reference for SF methods)
fh = """
    F 0 0 0
    H 0 0 1.0
"""

be = """ Be 0 0 0 """

h2o = """
    O  0.0000000  0.0000000  0.1173000
    H  0.0000000  0.7572000 -0.4692000
    H  0.0000000 -0.7572000 -0.4692000
"""

h2 = """
    H 0 0 0
    H 0 0 0.74
"""
