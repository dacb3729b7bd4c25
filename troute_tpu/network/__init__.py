from troute_tpu.network.topology import RoutingTopology, build_topology
