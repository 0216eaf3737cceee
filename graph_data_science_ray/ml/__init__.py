"""Driver-side trainable models (the GDS pipeline model catalog:
logisticRegression / linearRegression / randomForest / mlp) with
broadcastable params dicts and vectorized from-params scoring."""

from graph_data_science_ray.ml.linreg import LinearRegression
from graph_data_science_ray.ml.logreg import LogisticRegression
from graph_data_science_ray.ml.mlp import MLPClassifier
from graph_data_science_ray.ml.tree import RandomForestClassifier, RandomForestRegressor

#: GDS model-candidate names → constructors, per pipeline task
CLASSIFIER_CATALOG = {
    "logisticRegression": LogisticRegression,
    "randomForest": RandomForestClassifier,
    "mlp": MLPClassifier,
}
REGRESSOR_CATALOG = {
    "linearRegression": LinearRegression,
    "randomForest": RandomForestRegressor,
}


def classifier_proba(params: dict, X) -> "np.ndarray":  # noqa: F821
    """Dispatch class-probability scoring on a broadcast params dict."""
    kind = params.get("kind", "logistic_regression")
    if kind == "random_forest_classifier":
        return RandomForestClassifier.proba_from_params(params, X)
    if kind == "mlp_classifier":
        return MLPClassifier.proba_from_params(params, X)
    return LogisticRegression.proba_from_params(params, X)


def regressor_predict(params: dict, X) -> "np.ndarray":  # noqa: F821
    kind = params.get("kind", "linear_regression")
    if kind == "random_forest_regressor":
        return RandomForestRegressor.predict_from_params(params, X)
    return LinearRegression.predict_from_params(params, X)


__all__ = [
    "LinearRegression", "LogisticRegression", "MLPClassifier",
    "RandomForestClassifier", "RandomForestRegressor",
    "CLASSIFIER_CATALOG", "REGRESSOR_CATALOG",
    "classifier_proba", "regressor_predict",
]
