"""Observability: a local experiment logger with a comet_ml-compatible surface.

The reference logs everything to comet_ml (reference train.py:27-62,
src/models/multi_stage.py:436-483). This build ships a dependency-free
JSONL/CSV experiment logger exposing the same call surface
(log_metric/log_metrics/log_parameter/log_table/log_image/add_tag), so every
call site works offline; if comet_ml is importable and configured the same
calls can be tee'd to it by passing its experiment object anywhere an
`Experiment` is accepted.
"""
import json
import logging
import os
import time
import uuid


def get_logger(name="deeptreeattention_tpu"):
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("[%(asctime)s %(name)s %(levelname)s] %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


class Experiment:
    """Local experiment: metrics to JSONL, tables to CSV, params to JSON."""

    def __init__(self, savedir="results/experiments", project_name=None, key=None):
        self.id = key or uuid.uuid4().hex
        self.project_name = project_name
        self.dir = os.path.join(savedir, self.id)
        os.makedirs(self.dir, exist_ok=True)
        self._metrics_path = os.path.join(self.dir, "metrics.jsonl")
        self._params = {}
        self._tags = []
        self._step = 0

    def get_key(self):
        return self.id

    def set_step(self, step):
        self._step = step

    def add_tag(self, tag):
        self._tags.append(tag)
        self._flush_params()

    def log_parameter(self, name, value):
        self._params[str(name)] = _jsonable(value)
        self._flush_params()

    def log_parameters(self, params):
        for k, v in dict(params).items():
            self._params[str(k)] = _jsonable(v)
        self._flush_params()

    def log_metric(self, name, value, step=None, epoch=None):
        rec = {
            "t": time.time(),
            "name": str(name),
            "value": _jsonable(value),
            "step": self._step if step is None else step,
        }
        if epoch is not None:
            rec["epoch"] = epoch
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def log_metrics(self, metrics, prefix=None, step=None, epoch=None):
        for k, v in dict(metrics).items():
            name = "{}_{}".format(prefix, k) if prefix else k
            self.log_metric(name, v, step=step, epoch=epoch)

    def log_table(self, filename, dataframe):
        path = os.path.join(self.dir, os.path.basename(filename))
        try:
            dataframe.to_csv(path, index=False)
        except AttributeError:
            with open(path, "w") as f:
                json.dump(_jsonable(dataframe), f)
        return path

    def log_image(self, image_data=None, name=None, **kwargs):
        # Store image arrays as .npy; matplotlib figures are saved by caller.
        import numpy as np

        name = name or "image_{}".format(uuid.uuid4().hex[:8])
        safe = "".join(c if c.isalnum() or c in "._-" else "_" for c in str(name))
        path = os.path.join(self.dir, safe + ".npy")
        if image_data is not None and hasattr(image_data, "shape"):
            np.save(path, np.asarray(image_data))
        elif isinstance(image_data, str) and os.path.exists(image_data):
            # copy into the experiment dir — the source is often a temp file
            # (e.g. visualize.plot_crown) that gets reaped
            import shutil

            path = os.path.join(self.dir, safe + os.path.splitext(image_data)[1])
            if os.path.abspath(image_data) != os.path.abspath(path):
                shutil.copyfile(image_data, path)
        return {"imageId": safe, "path": path}

    def log_confusion_matrix(self, y_true=None, y_pred=None, labels=None, **kwargs):
        import numpy as np

        n = len(labels) if labels is not None else int(max(max(y_true), max(y_pred))) + 1
        mat = np.zeros((n, n), dtype=int)
        for t, p in zip(y_true, y_pred):
            mat[int(t), int(p)] += 1
        out = {"labels": list(labels) if labels is not None else list(range(n)),
               "matrix": mat.tolist()}
        with open(os.path.join(self.dir, "confusion_matrix.json"), "w") as f:
            json.dump(out, f)
        return out

    def end(self):
        self._flush_params()

    def _flush_params(self):
        with open(os.path.join(self.dir, "params.json"), "w") as f:
            json.dump({"params": self._params, "tags": self._tags}, f, indent=1)


class TeeExperiment:
    """Forward every log_* call to several experiment objects (e.g. the local
    Experiment plus a live comet_ml experiment)."""

    def __init__(self, *experiments):
        self.experiments = [e for e in experiments if e is not None]

    def __getattr__(self, name):
        if name == "experiments":  # not yet set (e.g. mid-unpickle): no recursion
            raise AttributeError(name)
        if not name.startswith("log_") and name not in ("add_tag", "set_step", "end"):
            # plain attributes (dir, get_key, ...) resolve from the primary
            # (local) experiment so entry scripts work identically with or
            # without a live comet sink
            for exp in self.experiments:
                if hasattr(exp, name):
                    return getattr(exp, name)
            raise AttributeError(name)

        def fanout(*args, **kwargs):
            result = None
            for exp in self.experiments:
                fn = getattr(exp, name, None)
                if fn is None:
                    continue
                try:
                    out = fn(*args, **kwargs)
                    result = result if result is not None else out
                except Exception as e:  # a sink failing must not kill the run
                    get_logger(__name__).warning("%s sink failed: %s", name, e)
            return result

        return fanout

    def get_key(self):
        for exp in self.experiments:
            if hasattr(exp, "get_key"):
                return exp.get_key()
        return None


def comet_experiment(project_name=None, workspace=None, savedir="results/experiments"):
    """Local Experiment, tee'd with comet_ml when importable+configured
    (reference-style observability without the hard dependency)."""
    local = Experiment(savedir=savedir, project_name=project_name)
    try:
        import comet_ml  # noqa: F401

        live = comet_ml.Experiment(project_name=project_name, workspace=workspace)
        return TeeExperiment(local, live)
    except Exception:
        return local


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except (TypeError, ValueError):
        try:
            import numpy as np

            if hasattr(v, "item") and getattr(v, "size", 2) == 1:
                return v.item()
            if isinstance(v, np.ndarray):
                return v.tolist()
        except Exception:
            pass
        return str(v)
