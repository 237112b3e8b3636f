from mind_tpu.models.scene_pred import ScenePredNet, init_scene_pred
