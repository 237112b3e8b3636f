from mind_tpu.sim.agents import NonReactiveAgent, CustomizedAgent, MINDAgent
from mind_tpu.sim.simulator import Simulator
