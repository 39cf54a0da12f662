# -*- coding: utf-8 -*-
#
# load_tdt: import Tucker-Davis Technologies recordings.
#
# Parity target: reference syncopy/io/load_tdt.py:24-880. Reads the TDT tank
# block format: the `.tsq` event-index file plus `.tev`/`.sev` payload files,
# assembling continuous streams into AnalogData.

import glob
import os
import struct

import numpy as np

from ..shared.errors import SPYIOError, SPYValueError

__all__ = ["load_tdt"]

# TDT .tsq record: 40 bytes
_TSQ_DTYPE = np.dtype(
    [
        ("size", "<i4"),
        ("type", "<i4"),
        ("code", "<u4"),
        ("channel", "<u2"),
        ("sortcode", "<u2"),
        ("timestamp", "<f8"),
        ("offset", "<u8"),  # file offset (or value for scalars)
        ("format", "<i4"),
        ("frequency", "<f4"),
    ]
)

_TDT_FORMATS = {0: np.float32, 1: np.int32, 2: np.int16, 3: np.int8, 4: np.float64}

_EVTYPE_STREAM = 0x8101
_EVTYPE_STREAM2 = 0x8111
_EVTYPE_SNIP = 0x8201
_EVTYPE_SCALAR = 0x0201


def _code_to_name(code):
    return struct.pack("<I", int(code)).decode("ascii", errors="replace")


def load_tdt(data_path, start_code=None, end_code=None, subtract_median=False):
    """
    Read a TDT block directory into an :class:`~syncopy_tpu.AnalogData`
    (one channel per stored stream channel). With `start_code`/`end_code`
    epoc event codes given, a trialdefinition is built from their
    timestamps; otherwise the recording is one trial.
    """
    data_path = os.path.abspath(os.path.expanduser(str(data_path)))
    if not os.path.isdir(data_path):
        raise SPYIOError(data_path, exists=False)
    tsq_files = sorted(glob.glob(os.path.join(data_path, "*.tsq")))
    if not tsq_files:
        # SEV-only recording: concatenate per-channel .sev files
        sev_files = sorted(glob.glob(os.path.join(data_path, "*.sev")))
        if sev_files:
            return _load_sev_only(sev_files)
        raise SPYValueError(
            legal="directory containing a .tsq index or .sev files",
            varname="data_path",
            actual=data_path,
        )

    tsq = np.fromfile(tsq_files[0], dtype=_TSQ_DTYPE)
    tev_files = sorted(glob.glob(os.path.join(data_path, "*.tev")))
    if not tev_files:
        raise SPYIOError(os.path.join(data_path, "*.tev"), exists=False)
    tev_path = tev_files[0]

    stream_mask = np.isin(tsq["type"], (_EVTYPE_STREAM, _EVTYPE_STREAM2))
    if not stream_mask.any():
        raise SPYValueError(legal="block with stream events", varname="data_path", actual=data_path)
    streams = tsq[stream_mask]
    codes, counts = np.unique(streams["code"], return_counts=True)
    # pick the dominant stream store
    code = codes[np.argmax(counts)]
    ev = streams[streams["code"] == code]
    fs = float(ev["frequency"][0])
    fmt = _TDT_FORMATS.get(int(ev["format"][0]), np.float32)
    itemsize = np.dtype(fmt).itemsize
    npts = (int(ev["size"][0]) - 10) * 4 // itemsize

    channels = np.unique(ev["channel"])
    chunks = {int(c): [] for c in channels}
    with open(tev_path, "rb") as f:
        for rec in ev:
            f.seek(int(rec["offset"]))
            buf = np.fromfile(f, dtype=fmt, count=npts)
            chunks[int(rec["channel"])].append(buf)
    nmin = min(sum(len(b) for b in blks) for blks in chunks.values())
    data = np.empty((nmin, len(channels)), dtype=np.float32)
    for j, c in enumerate(sorted(chunks)):
        data[:, j] = np.concatenate(chunks[c])[:nmin]
    if subtract_median:
        data -= np.median(data, axis=0, keepdims=True)

    from ..datatype.continuous_data import AnalogData

    adata = AnalogData(data=data, samplerate=fs)
    adata.channel = ["{}_{}".format(_code_to_name(code).strip(), c) for c in sorted(chunks)]

    if start_code is not None:
        t0 = tsq["timestamp"][stream_mask][0]
        scalars = tsq[tsq["type"] == _EVTYPE_SCALAR]
        starts = scalars["timestamp"][scalars["code"] == _name_to_code(start_code)] - t0
        if end_code is not None:
            ends = scalars["timestamp"][scalars["code"] == _name_to_code(end_code)] - t0
        else:
            ends = np.append(starts[1:], nmin / fs)
        rows = []
        for s, e in zip(starts, ends):
            s_smp, e_smp = int(round(s * fs)), int(round(e * fs))
            if 0 <= s_smp < e_smp <= nmin:
                rows.append([s_smp, e_smp, 0])
        if rows:
            adata.trialdefinition = np.asarray(rows, dtype=float)
    return adata


def _name_to_code(name):
    name = (str(name) + "    ")[:4]
    return struct.unpack("<I", name.encode("ascii"))[0]


def _load_sev_only(sev_files):
    """Per-channel .sev files: 40-byte header + raw samples."""
    from ..datatype.continuous_data import AnalogData

    sigs = []
    fs = None
    for path in sev_files:
        with open(path, "rb") as f:
            header = f.read(40)
            fmt_code = struct.unpack("<B", header[24:25])[0] & 0x7
            dtype = _TDT_FORMATS.get(fmt_code, np.float32)
            fs_this = struct.unpack("<f", header[32:36])[0]
            fs = fs or fs_this
            sigs.append(np.fromfile(f, dtype=dtype).astype(np.float32))
    nmin = min(s.size for s in sigs)
    data = np.column_stack([s[:nmin] for s in sigs])
    adata = AnalogData(data=data, samplerate=float(fs or 1.0))
    adata.channel = [os.path.basename(p).rsplit(".", 1)[0] for p in sev_files]
    return adata
