"""Run a profiling script with the repo root on sys.path (the axon
sitecustomize must initialize before we touch sys.path, so scripts are
exec'd rather than imported): python tools/profiling/_run.py <script>"""
import sys
import jax  # noqa: F401  (trigger plugin registration first)

sys.path.insert(0, "/root/repo")
script = sys.argv[1]
sys.argv = sys.argv[1:]
exec(compile(open(script).read(), script, "exec"))
