"""Physics parameterisations as pure jnp functions.

TPU-native re-implementations of the free functions in the reference's
physics library (reference: opendrift/models/physics_methods.py:120-560).
All functions are element-wise (VPU) and fuse into the step kernel; none
have data-dependent shapes or host control flow.
"""

import math

import jax
import jax.numpy as jnp

G = 9.81


# --------------------------------------------------------------- waves ----

def significant_wave_height_from_wind(wind_speed):
    """Neumann & Pierson (1966) / WMO (1998):  Hs = 0.0246 U^2
    (reference physics_methods.py:180)."""
    return 0.0246 * wind_speed ** 2


def wave_frequency_from_wind(wind_speed):
    """Pierson-Moskowitz peak angular frequency; 5 rad/s where calm
    (reference physics_methods.py:194-202)."""
    return jnp.where(wind_speed > 0,
                     0.877 * G / (1.17 * jnp.maximum(wind_speed, 1e-12)),
                     5.0)


def wave_period_from_wind(wind_speed):
    return 2.0 * math.pi / wave_frequency_from_wind(wind_speed)


def wave_breaking_fraction(wind_speed, wave_period):
    """Fraction of breaking waves (reference physics_methods.py:185)."""
    f = 0.032 * (wind_speed - 5.0) / wave_period
    return jnp.maximum(f, 0.0)


def wave_energy(hs, rho=1028.0):
    return G * rho * hs ** 2 / 16.0


def wave_energy_dissipation(hs, rho):
    """Delvigne & Sweeney (reference physics_methods.py:950)."""
    return 0.0034 * rho * G * hs ** 2


def wind_drag_coefficient(windspeed):
    """Large & Pond (1981) (reference physics_methods.py:981)."""
    return jnp.where(windspeed > 11.0,
                     0.001 * (0.49 + 0.065 * windspeed),
                     0.0012)


# ------------------------------------------------------- stokes drift -----

def stokes_transport_monochromatic(mean_wave_period, significant_wave_height):
    """(reference physics_methods.py:328-330)."""
    omega = 2.0 * math.pi / mean_wave_period
    return omega * significant_wave_height ** 2 / 16.0


def stokes_drift_profile_monochromatic(su, sv, hs, tp, z):
    """Breivik et al. (2014) monochromatic profile
    (reference physics_methods.py:332-357)."""
    speed0 = jnp.sqrt(su ** 2 + sv ** 2)
    transport = stokes_transport_monochromatic(tp, hs)
    km = speed0 / (2.0 * jnp.maximum(transport, 1e-12))
    unit = jnp.exp(2.0 * km * z)
    zero = speed0 == 0
    u = jnp.where(zero, 0.0, su * unit)
    v = jnp.where(zero, 0.0, sv * unit)
    return u, v, speed0 * unit


def stokes_drift_profile_exponential(su, sv, hs, tp, z):
    """Breivik et al. (2014) combined exp profile
    (reference physics_methods.py:359-386)."""
    speed0 = jnp.sqrt(su ** 2 + sv ** 2)
    transport = stokes_transport_monochromatic(tp, hs)
    km = speed0 / (2.0 * jnp.maximum(transport, 1e-12))
    ke = km / 3.0
    unit = jnp.exp(2.0 * ke * z) / (1.0 - 8.0 * ke * z)
    zero = speed0 == 0
    u = jnp.where(zero, 0.0, su * unit)
    v = jnp.where(zero, 0.0, sv * unit)
    return u, v, speed0 * unit


def stokes_drift_profile_phillips(su, sv, hs, tp, z):
    """Breivik et al. (2016) Phillips-spectrum profile
    (reference physics_methods.py:388-416)."""
    speed0 = jnp.sqrt(su ** 2 + sv ** 2)
    beta = 1.0
    transport = stokes_transport_monochromatic(tp, hs)
    km = speed0 * (1.0 - 2.0 * beta / 3.0) / (2.0 * jnp.maximum(transport,
                                                                1e-12))
    kz = km * jnp.abs(z)
    unit = (jnp.exp(2.0 * km * z)
            - beta * jnp.sqrt(2.0 * math.pi * kz)
            * jax.scipy.special.erfc(jnp.sqrt(2.0 * kz)))
    zero = speed0 == 0
    u = jnp.where(zero, 0.0, su * unit)
    v = jnp.where(zero, 0.0, sv * unit)
    return u, v, speed0 * unit


def stokes_drift_profile_windsea_swell(su, sv, swell_dir_to, swell_period,
                                       swell_height, windsea_dir_to,
                                       windsea_period, windsea_height, z):
    """Breivik & Christensen (2020) combined swell + wind-sea profile
    (reference physics_methods.py:418-455)."""
    th_ws_N = jnp.cos(jnp.radians(windsea_dir_to))
    th_ws_E = jnp.sin(jnp.radians(windsea_dir_to))
    th_sw_N = jnp.cos(jnp.radians(swell_dir_to))
    th_sw_E = jnp.sin(jnp.radians(swell_dir_to))
    denom = th_sw_E * th_ws_N - th_sw_N * th_ws_E
    swell_speed0 = (su * th_ws_N - sv * th_ws_E) / denom
    swell_u0 = swell_speed0 * th_sw_E
    swell_v0 = swell_speed0 * th_sw_N
    sw_u, sw_v, _ = stokes_drift_profile_monochromatic(
        swell_u0, swell_v0, swell_height, swell_period, z)
    wind_u0 = su - swell_u0
    wind_v0 = sv - swell_v0
    ws_u, ws_v, _ = stokes_drift_profile_phillips(
        wind_u0, wind_v0, windsea_height, windsea_period, z)
    u = sw_u + ws_u
    v = sw_v + ws_v
    return u, v, jnp.sqrt(u ** 2 + v ** 2)


# ------------------------------------------------- vertical diffusivity ---

def verticaldiffusivity_Sundby1983(windspeed, depth, mixedlayerdepth=50.0,
                                   background_diffusivity=0.0):
    """Sundby (1983) (reference physics_methods.py:203-216).
    ``depth`` positive downward."""
    K = 76.1e-4 + 2.26e-4 * windspeed ** 2 + jnp.zeros_like(depth)
    K = jnp.where(depth > mixedlayerdepth - 1.0,
                  (K + background_diffusivity) / 2.0, K)
    K = jnp.where(depth >= mixedlayerdepth, background_diffusivity, K)
    return K


def verticaldiffusivity_Large1994(windspeed, depth, mixedlayerdepth=50.0,
                                  background_diffusivity=0.0):
    """Large et al. (1994) (reference physics_methods.py:217-249)."""
    depth = jnp.abs(depth)
    MLD = mixedlayerdepth
    rhoa = 1.22
    cd = 1.25e-3
    windstress = windspeed ** 2 * cd * rhoa
    sigma = depth / MLD
    Gshape = sigma - 2.0 * sigma ** 2 + sigma ** 3
    Gshape = jnp.where(Gshape >= 1.0, 0.0, Gshape)
    K = MLD * 0.2 * 0.4 * Gshape * windstress + sigma * background_diffusivity
    return jnp.where(depth >= MLD, background_diffusivity, K)


def verticaldiffusivity_stepfunction(depth, MLD=20.0, k_above=0.1,
                                     k_below=0.02):
    """(reference physics_methods.py:251-257)."""
    return jnp.where(jnp.abs(depth) > MLD, k_below, k_above)


# ------------------------------------------------------------ seawater ----

def sea_water_density(T=10.0, S=35.0):
    """UNESCO 1983 (Fofonoff & Millard) one-atmosphere equation of state
    (reference physics_methods.py:574-608)."""
    R4 = 4.8314e-04
    DR350 = 28.106331
    R1 = ((((6.536332e-09 * T - 1.120083e-06) * T + 1.001685e-04) * T
           - 9.095290e-03) * T + 6.793952e-02) * T - 28.263737
    R2 = (((5.3875e-09 * T - 8.2467e-07) * T + 7.6438e-05) * T
          - 4.0899e-03) * T + 8.24493e-01
    R3 = (-1.6546e-06 * T + 1.0227e-04) * T - 5.72466e-03
    sig = R1 + (R4 * S + R3 * jnp.sqrt(jnp.maximum(S, 0.0)) + R2) * S
    return sig + DR350 + 1000.0


def sea_water_dynamic_viscosity(T=10.0, S=35.0):
    """Sharqawy et al. (2010) correlation, as used by LADiM/reference
    (reference physics_methods.py:139-178).  Returns mu [kg/m/s]."""
    mu_w = 4.2844e-5 + 1.0 / (0.157 * (T + 64.993) ** 2 - 91.296)
    A = 1.541 + 1.998e-2 * T - 9.52e-5 * T ** 2
    B = 7.974 - 7.561e-2 * T + 4.724e-4 * T ** 2
    Sr = S / 1000.0
    return mu_w * (1.0 + A * Sr + B * Sr ** 2)


def sea_water_kinematic_viscosity(T=10.0, S=35.0):
    return sea_water_dynamic_viscosity(T, S) / sea_water_density(T, S)
