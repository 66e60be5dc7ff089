"""Build the native IO runtime: python setup.py build_ext --inplace."""

from setuptools import Extension, setup

setup(
    name="of_dis_tpu",
    version="0.1.0",
    packages=["of_dis_tpu"],
    ext_modules=[
        Extension(
            "of_dis_tpu.native._native_io",
            sources=["of_dis_tpu/native/io_native.cpp"],
            libraries=["z"],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
)
