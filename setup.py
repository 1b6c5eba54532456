"""Build driver: compiles the native C++ components into the package's
io/_native/ directory at build time (reference: pyclaragenomics
setup_pyclaragenomics.py builds the C++ libs before the Python package
[U]).  The libraries are plain `extern "C"` shared objects loaded via
ctypes (no pybind11), with pure-Python fallbacks when absent."""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildNativeAndPy(build_py):
    def run(self):
        root = Path(__file__).parent
        script = root / "native" / "build.sh"
        try:
            subprocess.run(["sh", str(script)], check=True)
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"warning: native build failed ({e}); the package will "
                  "use its pure-Python fallbacks", file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildNativeAndPy})
