"""Version string with the git commit stamp.

Mirrors the reference's configured version header
(reference: src/version.hpp.in, meson.build:64-87 — major/minor/patch
plus the git commit id baked in at build time).  Being a from-source
package, racon_tpu resolves the commit lazily at import instead of at
build time; outside a git checkout the plain semver is used.
"""

__version__ = "0.3.0"


def _git_commit() -> str:
    import os
    import subprocess
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=5)
        if out.returncode == 0:
            return out.stdout.strip()
    except Exception:
        pass
    return ""


_commit = _git_commit()
version_string = f"v{__version__}" + (f"-{_commit}" if _commit else "")
