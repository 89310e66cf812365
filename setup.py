"""Build hook: compile the native host engine into the wheel.

The package also builds the library lazily on first import (sdist /
editable installs); wheels built here ship the compiled libkt_host.so.
"""

import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution


class BuildNative(build_py):
    def run(self):
        subprocess.run(["make", "-C", "kalign_tpu/native"], check=True)
        super().run()


class BinaryDistribution(Distribution):
    """The wheel carries a compiled C++ shared library: force a
    platform tag (a py3-none-any wheel would ship a linux-x86_64 ELF
    to every platform)."""

    def has_ext_modules(self):
        return True


setup(cmdclass={"build_py": BuildNative}, distclass=BinaryDistribution)
