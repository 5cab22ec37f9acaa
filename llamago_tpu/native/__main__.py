"""`python -m llamago_tpu.native --build` — (re)build libggjt.so."""

import sys

from llamago_tpu.native import available, build

force = "--build" in sys.argv or "--force" in sys.argv
ok = build(force=force)
print(f"native data-path library: built={ok} available={available()}")
sys.exit(0 if ok or available() else 1)
