"""Static-analysis gate over the native C++ (tools/static_analysis.sh):
GCC's strictest relevant warning set, warnings-as-errors, both build
profiles.  The reference pins the same discipline via .clang-tidy /
.cppcheck_suppress / CPPLINT.cfg (/root/reference/.clang-tidy); this image
ships no clang-tidy or cppcheck, so the GCC gate is the rig."""

import os
import subprocess


def test_native_static_analysis_clean():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        ["bash", os.path.join(repo, "tools", "static_analysis.sh")],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
