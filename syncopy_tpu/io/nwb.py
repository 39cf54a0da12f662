# -*- coding: utf-8 -*-
#
# NWB export: write AnalogData / TimeLockData / SpikeData to NWB files.
#
# Parity target: reference syncopy/io/nwb.py:40-329. Uses pynwb when
# available; otherwise raises a clear error (pynwb is an optional
# dependency in the reference, too).

import numpy as np

from ..shared.errors import SPYError

__all__ = ["_analog_to_nwb", "_timelock_to_nwb", "_spike_to_nwb"]


def _require_pynwb():
    try:
        import pynwb  # noqa: F401
        from pynwb import NWBFile, NWBHDF5IO  # noqa: F401

        return pynwb
    except ImportError:
        raise SPYError(
            "Exporting to NWB requires the optional dependency 'pynwb'; "
            "install it to use save_nwb()."
        )


def _mk_nwbfile(pynwb, obj, nwbfile=None):
    from datetime import datetime, timezone
    from uuid import uuid4

    if nwbfile is not None:
        return nwbfile
    return pynwb.NWBFile(
        session_description="syncopy_tpu export",
        identifier=str(uuid4()),
        session_start_time=datetime.now(timezone.utc),
    )


def _add_electrodes(pynwb, nwbfile, n_channels, labels=None):
    """Electrode table with per-channel labels so a round-trip through
    load_nwb restores channel names (reference nwb.py:40-120)."""
    device = nwbfile.create_device(name="device")
    egroup = nwbfile.create_electrode_group(
        name="electrodes_group", description="syncopy_tpu electrodes",
        location="unknown", device=device,
    )
    if labels is not None and len(labels) == n_channels:
        nwbfile.add_electrode_column(name="label", description="channel label")
        for lab in labels:
            nwbfile.add_electrode(group=egroup, location="unknown", label=str(lab))
    else:
        for _ in range(n_channels):
            nwbfile.add_electrode(group=egroup, location="unknown")
    return nwbfile.create_electrode_table_region(
        region=list(range(n_channels)), description="all electrodes"
    )


def _add_trials(nwbfile, obj):
    sr = obj.samplerate or 1.0
    trl = obj.trialdefinition
    if trl is None:
        return
    for row in trl:
        nwbfile.add_trial(start_time=float(row[0]) / sr, stop_time=float(row[1]) / sr)


def _analog_to_nwb(adata, outpath, nwbfile=None, with_trialdefinition=True, is_raw=True):
    pynwb = _require_pynwb()
    from pynwb.ecephys import ElectricalSeries, LFP

    nwbfile = _mk_nwbfile(pynwb, adata, nwbfile)
    region = _add_electrodes(
        pynwb, nwbfile, len(adata.channel),
        labels=[str(c) for c in np.asarray(adata.channel)],
    )
    series = ElectricalSeries(
        name="ElectricalSeries",
        data=np.asarray(adata.data),
        electrodes=region,
        starting_time=0.0,
        rate=float(adata.samplerate or 1.0),
    )
    if is_raw:
        nwbfile.add_acquisition(series)
    else:
        lfp = LFP(electrical_series=series)
        module = nwbfile.create_processing_module(name="ecephys", description="LFP data")
        module.add(lfp)
    if with_trialdefinition:
        _add_trials(nwbfile, adata)
    with pynwb.NWBHDF5IO(str(outpath), "w") as io:
        io.write(nwbfile)
    return str(outpath)


def _timelock_to_nwb(tldata, outpath, with_trialdefinition=True):
    return _analog_to_nwb(tldata, outpath, with_trialdefinition=with_trialdefinition, is_raw=False)


def _spike_to_nwb(sdata, outpath, nwbfile=None, with_trialdefinition=True):
    pynwb = _require_pynwb()
    nwbfile = _mk_nwbfile(pynwb, sdata, nwbfile)
    sr = float(sdata.samplerate or 1.0)
    data = np.asarray(sdata.data)
    ucol = sdata.dimord.index("unit")
    scol = sdata.dimord.index("sample")
    for unit_id in np.unique(data[:, ucol]):
        times = data[data[:, ucol] == unit_id, scol] / sr
        nwbfile.add_unit(spike_times=times.tolist())
    if with_trialdefinition:
        _add_trials(nwbfile, sdata)
    with pynwb.NWBHDF5IO(str(outpath), "w") as io:
        io.write(nwbfile)
    return str(outpath)
