from mind_tpu.ops.potential import cost_node_eval, potential_field_eval
