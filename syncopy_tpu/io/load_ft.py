# -*- coding: utf-8 -*-
#
# load_ft_raw: import MATLAB/FieldTrip ft_datatype_raw structures.
#
# Parity target: reference syncopy/io/load_ft.py:24-552 (MAT v7.3 via h5py
# streaming; pre-7.3 via scipy.io.loadmat).

import os

import numpy as np

from ..shared.errors import SPYIOError, SPYWarning

__all__ = ["load_ft_raw"]


def load_ft_raw(filename, list_only=False, select_structures=None, include_fields=None, mem_use=4000):
    """
    Read FieldTrip ``ft_datatype_raw`` struct(s) from a ``.mat`` file into
    :class:`~syncopy_tpu.AnalogData` object(s).

    Returns a dict mapping struct name -> AnalogData (fields beyond
    trial/time/label/fsample/trialinfo are attached to ``.info`` when listed
    in `include_fields`). With ``list_only=True``, just the struct names.
    """
    fpath = os.path.abspath(os.path.expanduser(str(filename)))
    if not os.path.isfile(fpath):
        raise SPYIOError(fpath, exists=False)

    try:
        import h5py

        with h5py.File(fpath, "r") as f:
            is_v73 = True
            names = [k for k in f.keys() if not k.startswith("#")]
    except OSError:
        is_v73 = False
        names = None

    if is_v73:
        return _load_v73(fpath, names, list_only, select_structures, include_fields)
    return _load_pre73(fpath, list_only, select_structures, include_fields)


def _struct_to_adata(trials, times, labels, fsample, trialinfo=None):
    from ..datatype.continuous_data import AnalogData

    arrs = []
    offsets = []
    for trl, tvec in zip(trials, times):
        arr = np.asarray(trl)
        # FieldTrip stores trials as [channel x time]; syncopy is [time x channel]
        if arr.shape[0] == len(labels) and (arr.ndim == 2):
            arr = arr.T
        arrs.append(arr.astype(np.float32, copy=False))
        offsets.append(int(round(float(np.asarray(tvec).ravel()[0]) * fsample)))

    adata = AnalogData(data=arrs, samplerate=float(fsample))
    trl = adata.trialdefinition
    trl[:, 2] = offsets
    if trialinfo is not None and np.asarray(trialinfo).size:
        ti = np.atleast_2d(np.asarray(trialinfo, dtype=float))
        if ti.shape[0] != trl.shape[0] and ti.shape[1] == trl.shape[0]:
            ti = ti.T
        if ti.shape[0] == trl.shape[0]:
            trl = np.hstack([trl, ti])
    adata.trialdefinition = trl
    adata.channel = [str(l) for l in labels]
    return adata


def _load_v73(fpath, names, list_only, select_structures, include_fields):
    import h5py

    if list_only:
        return names
    if select_structures is not None:
        names = [n for n in names if n in select_structures]
    out = {}
    with h5py.File(fpath, "r") as f:
        for name in names:
            grp = f[name]
            if not all(k in grp for k in ("trial", "time", "label")):
                SPYWarning("skipping '{}': not an ft_datatype_raw struct".format(name))
                continue

            def _deref(ds):
                items = []
                refs = np.asarray(ds).ravel()
                for r in refs:
                    items.append(np.asarray(f[r]))
                return items

            raw_trials = _deref(grp["trial"])
            raw_times = _deref(grp["time"])
            # MATLAB HDF5 stores arrays transposed: [chan x time] -> stored [time x chan]
            trials = [t.T for t in raw_trials]
            times = [t.ravel() for t in raw_times]
            labels = []
            for r in np.asarray(grp["label"]).ravel():
                raw = np.asarray(f[r]).ravel()
                labels.append("".join(chr(int(c)) for c in raw))
            fsample = float(np.asarray(grp["fsample"]).ravel()[0]) if "fsample" in grp else (
                1.0 / float(np.mean(np.diff(times[0])))
            )
            trialinfo = np.asarray(grp["trialinfo"]).T if "trialinfo" in grp else None
            adata = _struct_to_adata(trials, times, labels, fsample, trialinfo)
            if include_fields:
                for fld in include_fields:
                    if fld in grp:
                        try:
                            adata.info[fld] = np.asarray(grp[fld]).tolist()
                        except Exception:
                            pass
            out[name] = adata
    return out


def _load_pre73(fpath, list_only, select_structures, include_fields):
    from scipy.io import loadmat

    mat = loadmat(fpath, squeeze_me=True, struct_as_record=False)
    names = [k for k in mat.keys() if not k.startswith("__")]
    if list_only:
        return names
    if select_structures is not None:
        names = [n for n in names if n in select_structures]
    out = {}
    for name in names:
        st = mat[name]
        if not hasattr(st, "trial") or not hasattr(st, "label"):
            SPYWarning("skipping '{}': not an ft_datatype_raw struct".format(name))
            continue
        trials = st.trial if isinstance(st.trial, (list, np.ndarray)) else [st.trial]
        if isinstance(trials, np.ndarray) and trials.dtype == object:
            trials = list(trials)
        elif isinstance(trials, np.ndarray) and trials.ndim == 2:
            trials = [trials]
        times = st.time if isinstance(st.time, (list, np.ndarray)) else [st.time]
        if isinstance(times, np.ndarray) and times.dtype == object:
            times = list(times)
        elif isinstance(times, np.ndarray) and times.ndim == 1:
            times = [times]
        labels = [str(l) for l in np.atleast_1d(st.label)]
        fsample = float(getattr(st, "fsample", 1.0 / float(np.mean(np.diff(np.asarray(times[0]).ravel())))))
        trialinfo = getattr(st, "trialinfo", None)
        adata = _struct_to_adata(trials, times, labels, fsample, trialinfo)
        if include_fields:
            for fld in include_fields:
                if hasattr(st, fld):
                    try:
                        adata.info[fld] = np.asarray(getattr(st, fld)).tolist()
                    except Exception:
                        pass
        out[name] = adata
    return out
