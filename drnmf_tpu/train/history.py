"""Training metric history.

Equivalent of the reference's ``LossHistory`` callback
(custom_callbacks.py:4-27): records every batch-end and epoch-end metric dict
and persists the whole history to the histfile after each epoch.  Persisted
as a pickle of ``{'on_batch_end': {...}, 'on_epoch_end': {...}}`` -- the same
layout the reference's reporting tools consume (print_scores.py:64-69).
"""

import pickle


class LossHistory:
    def __init__(self, histfile=None, resume=False):
        self.histfile = histfile
        self.history = {"on_batch_end": {}, "on_epoch_end": {}}
        if resume and histfile is not None:
            import os

            if os.path.exists(histfile):
                self.history = self.load(histfile)

    def _append(self, where, metrics):
        store = self.history[where]
        for key, value in metrics.items():
            store.setdefault(key, []).append(float(value))

    def on_batch_end(self, metrics):
        self._append("on_batch_end", metrics)

    def on_epoch_end(self, metrics):
        self._append("on_epoch_end", metrics)
        if self.histfile is not None:
            with open(self.histfile, "wb") as f:
                pickle.dump(self.history, f)

    @staticmethod
    def load(histfile):
        with open(histfile, "rb") as f:
            return pickle.load(f)
