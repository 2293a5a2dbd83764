"""Minimal XSpace/XPlane profile reader (no TF dependency).

``jax.profiler.start_trace`` writes ``*.xplane.pb`` protobufs (the
XSpace schema from tsl/profiler).  The installed
tensorboard-plugin-profile's converter is broken against this protobuf
version, so this module decodes the wire format directly — enough to
aggregate per-op device time, which is what the roofline analysis
(docs/roofline.md, VERDICT r4 item 1) and ``runtime.trace.device_trace``
consumers need.

Schema subset (field numbers from tensorflow/tsl xplane.proto):
  XSpace.planes=1; XPlane{id=1,name=2,lines=3,event_metadata=4(map),
  stat_metadata=5(map)}; XLine{id=1,name=2,timestamp_ns=3,events=4};
  XEvent{metadata_id=1,offset_ps=2,duration_ps=3};
  XEventMetadata{id=1,name=2,display_name=4}.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    r = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << shift
        if not b & 0x80:
            return r, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:                       # varint
            v, i = _varint(buf, i)
        elif wt == 2:                     # length-delimited
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:                     # 32-bit
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:                     # 64-bit
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


class Line:
    def __init__(self, name: str):
        self.name = name
        self.events: List[Tuple[int, int, int]] = []   # (meta_id, off, dur) ps


class Plane:
    def __init__(self, name: str):
        self.name = name
        self.event_names: Dict[int, str] = {}
        self.lines: List[Line] = []

    def op_durations(self) -> Dict[str, Tuple[int, int]]:
        """name -> (total_ps, count) summed over all lines."""
        out: Dict[str, Tuple[int, int]] = {}
        for line in self.lines:
            for mid, _off, dur in line.events:
                name = self.event_names.get(mid, f"#{mid}")
                t, c = out.get(name, (0, 0))
                out[name] = (t + dur, c + 1)
        return out


def _parse_event(buf: bytes) -> Tuple[int, int, int]:
    mid = off = dur = 0
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            mid = v
        elif fno == 2:
            off = v
        elif fno == 3:
            dur = v
    return mid, off, dur


def _parse_line(buf: bytes) -> Line:
    line = Line("")
    for fno, _wt, v in _fields(buf):
        if fno == 2:
            line.name = v.decode("utf-8", "replace")
        elif fno == 4:
            line.events.append(_parse_event(v))
    return line


def _parse_event_metadata_entry(buf: bytes) -> Tuple[int, str]:
    """map<int64, XEventMetadata> entry -> (id, name)."""
    key, name = 0, ""
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            key = v
        elif fno == 2:
            for f2, _w2, v2 in _fields(v):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
                elif f2 == 4 and not name:
                    name = v2.decode("utf-8", "replace")
    return key, name


def _parse_plane(buf: bytes) -> Plane:
    plane = Plane("")
    for fno, _wt, v in _fields(buf):
        if fno == 2:
            plane.name = v.decode("utf-8", "replace")
        elif fno == 3:
            plane.lines.append(_parse_line(v))
        elif fno == 4:
            k, name = _parse_event_metadata_entry(v)
            plane.event_names[k] = name
    return plane


def parse_xspace(path: str) -> List[Plane]:
    with open(path, "rb") as f:
        buf = f.read()
    return [_parse_plane(v) for fno, _wt, v in _fields(buf) if fno == 1]


def find_xplane_file(logdir: str) -> str:
    hits = sorted(glob.glob(os.path.join(
        logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {logdir}")
    return hits[-1]


def device_op_table(logdir: str, device_substr: str = "TPU"):
    """Aggregate per-op device time from the newest trace in ``logdir``.

    Returns (plane_name, {op_name: (total_seconds, count)}) for the
    first plane whose name contains ``device_substr``.
    """
    planes = parse_xspace(find_xplane_file(logdir))
    for plane in planes:
        if device_substr in plane.name:
            table = {name: (ps / 1e12, cnt)
                     for name, (ps, cnt) in plane.op_durations().items()}
            return plane.name, table
    names = [p.name for p in planes]
    raise ValueError(f"no plane matching {device_substr!r}; have {names}")
