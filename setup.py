"""Build hook: compile the native host engine into the wheel.

The package also builds the library lazily on first import (sdist /
editable installs); wheels built here ship the compiled libkt_host.so.
"""

import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildNative(build_py):
    def run(self):
        subprocess.run(["make", "-C", "kalign_tpu/native"], check=True)
        super().run()


setup(cmdclass={"build_py": BuildNative})
