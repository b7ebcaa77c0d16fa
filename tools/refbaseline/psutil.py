"""Minimal stand-in for the `psutil` API surface used by the reference's
pandasql.memory_utils (virtual_memory().available). The sandbox has no
psutil wheel and no egress; this reads /proc/meminfo directly."""
from collections import namedtuple

_VM = namedtuple("vm", ["available"])

def virtual_memory():
    avail = None
    with open("/proc/meminfo") as fh:
        for line in fh:
            if line.startswith("MemAvailable:"):
                avail = int(line.split()[1]) * 1024
                break
    return _VM(available=avail if avail is not None else 8 << 30)
