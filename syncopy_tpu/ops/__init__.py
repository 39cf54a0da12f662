# -*- coding: utf-8 -*-
# Stateless TPU-native (JAX/Pallas) numeric kernels — the analog of the
# reference's NumPy/SciPy algorithm backends (SURVEY.md L4).
