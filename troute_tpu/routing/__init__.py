from troute_tpu.routing.engine import (
    ChannelParams, NetworkArrays, RoutingConfig, RoutingState, route,
    network_arrays_from_topology,
)
