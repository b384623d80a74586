"""End-to-end spectral DNS workload test.

The reference CI runs examples/spectral_dns_solver.py under mpiexec -n 2
and asserts the Taylor-Green kinetic energy constant
(reference: examples/spectral_dns_solver.py:126-129, tests/runtests.sh:36).
Here the same solver runs on the 8-device virtual mesh.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'examples'))


def test_dns_energy():
    import spectral_dns_solver as dns
    k = dns.run(N=(64, 64, 64), T=0.1, dt=0.01, verbose=False)
    assert round(k - 0.124953117517, 7) == 0, k
