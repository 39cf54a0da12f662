# -*- coding: utf-8 -*-
#
# freqanalysis: user-facing (time-)frequency analysis frontend.
#
# Parity target: reference syncopy/specest/freqanalysis.py:62-1064.
# Methods: mtmfft, mtmconvol, wavelet, superlet, welch (+ FOOOF outputs).

import numpy as np

from ..datatype.continuous_data import SpectralData
from ..shared.errors import SPYError, SPYTypeError, SPYValueError, SPYWarning, SPYInfo
from ..shared.input_processors import (
    check_effective_parameters,
    check_passed_kwargs,
    process_foi,
    process_padding,
    process_taper,
)
from ..shared.kwarg_decorators import detect_parallel_client, unwrap_cfg, unwrap_select
from ..shared.parsers import data_parser, scalar_parser
from ..shared.tools import best_match, get_defaults, get_frontend_cfg

__all__ = ["freqanalysis"]

availableMethods = ("mtmfft", "mtmconvol", "wavelet", "superlet", "welch")
availableOutputs = (
    "pow", "abs", "fourier", "real", "imag", "angle", "absreal", "absimag",
    "fooof", "fooof_aperiodic", "fooof_peaks",
)


@unwrap_cfg
@unwrap_select
@detect_parallel_client
def freqanalysis(
    data,
    method="mtmfft",
    output="pow",
    keeptrials=True,
    foi=None,
    foilim=None,
    pad="maxperlen",
    polyremoval=0,
    taper="hann",
    demean_taper=False,
    taper_opt=None,
    tapsmofrq=None,
    nTaper=None,
    keeptapers=False,
    toi="all",
    t_ftimwin=None,
    wavelet="Morlet",
    width=6,
    order=None,
    order_max=None,
    order_min=1,
    c_1=3,
    adaptive=False,
    out=None,
    fooof_opt=None,
    ft_compat=False,
    parallel=None,
    chan_per_worker=None,
    **kwargs,
):
    """
    Perform (time-)frequency analysis of :class:`~syncopy_tpu.AnalogData`.

    Methods: ``mtmfft`` ((multi-)tapered FFT), ``mtmconvol`` (sliding-window
    STFT), ``wavelet`` (CWT), ``superlet`` (adaptive superresolution
    wavelets), ``welch`` (overlapping-segment averaged periodogram).
    FieldTrip-compatible ``cfg``/``select`` conventions apply.

    Reference: syncopy/specest/freqanalysis.py:62.
    """
    data_parser(data, varname="data", dataclass="AnalogData", empty=False)
    timeAxis = data.dimord.index("time")

    if method not in availableMethods:
        raise SPYValueError(legal=str(availableMethods), varname="method", actual=str(method))
    if output not in availableOutputs:
        raise SPYValueError(legal=str(availableOutputs), varname="output", actual=str(output))
    if not isinstance(keeptrials, bool):
        raise SPYTypeError(keeptrials, varname="keeptrials", expected="bool")
    if polyremoval is not None:
        scalar_parser(polyremoval, varname="polyremoval", ntype="int_like", lims=[0, 1])

    defaults = get_defaults(freqanalysis)
    lcls = locals()
    check_passed_kwargs(lcls, defaults, frontend_name="freqanalysis")
    new_cfg = get_frontend_cfg(defaults, lcls, kwargs)

    # fooof outputs ride on mtmfft
    fooof_flavour = None
    if output.startswith("fooof"):
        if method != "mtmfft":
            raise SPYValueError(
                legal="method 'mtmfft' for FOOOF outputs", varname="method", actual=method
            )
        fooof_flavour = output
        output = "pow"

    # (selected) trial lengths
    if data.selection is not None:
        sel = data.selection
        lenTrials = np.array(
            [sel.select_trial_array(data, k).shape[timeAxis] for k in range(len(sel.trial_ids))]
        )
    else:
        trl = data.trialdefinition
        lenTrials = (trl[:, 1] - trl[:, 0]).astype(int)
    if lenTrials.size == 0:
        raise SPYValueError(legal="at least one trial", varname="data")

    foi, foilim = process_foi(foi, foilim, data.samplerate)

    if method in ("mtmfft", "welch"):
        nSamples = process_padding(pad, lenTrials, data.samplerate)
    else:
        nSamples = int(lenTrials.max())

    # -- method dispatch ------------------------------------------------- #

    if method == "mtmfft":
        taper, taper_opt = process_taper(
            taper, taper_opt, tapsmofrq, nTaper, keeptapers,
            foimax=data.samplerate / 2, samplerate=data.samplerate,
            nSamples=nSamples, output=output,
        )
        freqs = np.fft.rfftfreq(nSamples, 1.0 / data.samplerate)
        freq_idx = None
        if foi is not None:
            _, freq_idx = best_match(freqs, foi, squash_duplicates=True)
        elif foilim is not None:
            _, freq_idx = best_match(freqs, foilim, span=True)

        from .compRoutines import MultiTaperFFT

        check_effective_parameters(MultiTaperFFT, defaults, lcls)
        specestMethod = MultiTaperFFT(
            samplerate=data.samplerate,
            nfft=nSamples,
            taper=taper,
            taper_opt=taper_opt,
            demean_taper=demean_taper,
            output=output,
            keeptapers=keeptapers,
            polyremoval=polyremoval,
            freq_idx=freq_idx,
            ft_compat=ft_compat,
        )

    elif method in ("mtmconvol", "welch"):
        from .compRoutines import MultiTaperFFTConvol  # noqa: F401

        return _mtmconvol_route(
            data, lenTrials, nSamples, method, output, keeptrials, foi, foilim,
            polyremoval, taper, taper_opt, tapsmofrq, nTaper, keeptapers, toi,
            t_ftimwin, out, parallel, ft_compat, new_cfg, defaults, lcls,
        )

    elif method == "wavelet":
        from .compRoutines import WaveletTransform

        return _wavelet_route(
            data, lenTrials, output, keeptrials, foi, foilim, polyremoval,
            toi, wavelet, width, order, out, parallel, new_cfg, defaults, lcls,
        )

    elif method == "superlet":
        from .compRoutines import SuperletTransform

        return _superlet_route(
            data, lenTrials, output, keeptrials, foi, foilim, polyremoval,
            toi, order_max, order_min, c_1, adaptive, out, parallel, new_cfg,
            defaults, lcls,
        )

    # -- mtmfft execution ------------------------------------------------ #

    if out is not None:
        data_parser(out, varname="out", dataclass="SpectralData", empty=True)
        new_out = False
    else:
        out = SpectralData(dimord=SpectralData._defaultDimord)
        new_out = True

    specestMethod.initialize(
        data, out._stackingDim, chan_per_worker=chan_per_worker, keeptrials=keeptrials
    )
    specestMethod.compute(
        data, out, parallel=parallel, log_dict={"method": method, "output": output}
    )

    if fooof_flavour is not None:
        from .fooof_route import run_fooof

        out = run_fooof(out, fooof_flavour, fooof_opt)

    out.cfg.update({"freqanalysis": new_cfg})
    return out if new_out or fooof_flavour else out


def _mtmconvol_route(*args, **kwargs):
    raise SPYError("method 'mtmconvol'/'welch' not implemented yet")


def _wavelet_route(*args, **kwargs):
    raise SPYError("method 'wavelet' not implemented yet")


def _superlet_route(*args, **kwargs):
    raise SPYError("method 'superlet' not implemented yet")
