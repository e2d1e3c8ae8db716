from sensorium_tpu.infer.ensemble import ensemble_experiments  # noqa: F401
from sensorium_tpu.infer.predictor import Predictor, predict_mouse_split  # noqa: F401
from sensorium_tpu.infer.submission import (  # noqa: F401
    cut_responses_for_submission,
    evaluate_folds_predictions,
    make_submission,
)
