"""Build hook: compile the C++ neighbor sampler (native/sampler.cpp) into the
package so installed wheels carry it.  The library is a plain ctypes shared
object (no Python C API), so we drive the compiler directly instead of using
setuptools.Extension (which would expect a PyInit_ symbol)."""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithSampler(build_py):
    def run(self):
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native", "sampler.cpp")
        dst_dir = os.path.join("complexhyperbolickge_tpu", "data")
        dst = os.path.join(dst_dir, "libkgsampler.so")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-shared",
                     "-o", dst, src],
                    check=True,
                )
            except Exception as e:  # numpy fallback exists at runtime
                print(f"warning: sampler build failed ({e}); "
                      "the numpy fallback sampler will be used")
        super().run()


setup(cmdclass={"build_py": BuildWithSampler})
