"""Build script.

Replaces the reference's FFTW-discovery + tri-precision codegen build
(reference: setup.py:29-206) with a single native extension: the transform
engine is JAX/XLA (no codegen needed — precision tiers are dtypes), and the
native runtime piece is the host staging module (native/hoststage.cpp).
"""
from setuptools import setup, Extension, find_packages

ext = Extension(
    "mpi4py_fft_tpu._hoststage",
    sources=["native/hoststage.cpp"],
    extra_compile_args=["-O3", "-std=c++17"],
    language="c++",
)

setup(
    name="mpi4py_fft_tpu",
    version="0.1.0",
    description="TPU-native distributed FFT framework "
                "(capabilities of mpi4py-fft on JAX/XLA/Pallas)",
    packages=find_packages(include=["mpi4py_fft_tpu", "mpi4py_fft_tpu.*"]),
    ext_modules=[ext],
    python_requires=">=3.10",
)
