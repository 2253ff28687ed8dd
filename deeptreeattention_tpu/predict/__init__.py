from deeptreeattention_tpu.predict.tiles import (
    find_crowns,
    generate_prediction_crops,
    predict_crowns,
    predict_dead,
    predict_species,
    predict_tile,
)
