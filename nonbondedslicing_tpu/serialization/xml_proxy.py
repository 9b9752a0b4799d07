"""XML serialization of SlicedNonbondedForce.

Round-trips the exact field set of the reference's serialization proxy
(/root/reference/serialization/src/SlicedNonbondedForceProxy.cpp:24-162),
using the same element and attribute names so that force definitions are
portable between the two implementations, and version-gated identically.
"""

import xml.etree.ElementTree as ET

from ..models.force import OpenMMException, SlicedNonbondedForce


class XmlSerializer:
    @staticmethod
    def serialize(force: SlicedNonbondedForce) -> str:
        if not isinstance(force, SlicedNonbondedForce):
            raise OpenMMException("XmlSerializer: unsupported object type")
        node = ET.Element("SlicedNonbondedForce")
        node.set("version", "1")
        node.set("numSubsets", str(force.getNumSubsets()))
        node.set("forceGroup", str(force.getForceGroup()))
        node.set("name", force.getName())
        node.set("method", str(force.getNonbondedMethod()))
        node.set("cutoff", repr(force.getCutoffDistance()))
        node.set("useSwitchingFunction", str(int(force.getUseSwitchingFunction())))
        node.set("switchingDistance", repr(force.getSwitchingDistance()))
        node.set("ewaldTolerance", repr(force.getEwaldErrorTolerance()))
        node.set("rfDielectric", repr(force.getReactionFieldDielectric()))
        node.set("dispersionCorrection", str(int(force.getUseDispersionCorrection())))
        node.set("exceptionsUsePeriodic",
                 str(int(force.getExceptionsUsePeriodicBoundaryConditions())))
        node.set("includeDirectSpace", str(int(force.getIncludeDirectSpace())))
        alpha, nx, ny, nz = force.getPMEParameters()
        node.set("alpha", repr(alpha))
        node.set("nx", str(nx))
        node.set("ny", str(ny))
        node.set("nz", str(nz))
        alpha, nx, ny, nz = force.getLJPMEParameters()
        node.set("ljAlpha", repr(alpha))
        node.set("ljnx", str(nx))
        node.set("ljny", str(ny))
        node.set("ljnz", str(nz))
        node.set("recipForceGroup", str(force.getReciprocalSpaceForceGroup()))

        globals_node = ET.SubElement(node, "GlobalParameters")
        for i in range(force.getNumGlobalParameters()):
            p = ET.SubElement(globals_node, "Parameter")
            p.set("name", force.getGlobalParameterName(i))
            p.set("default", repr(force.getGlobalParameterDefaultValue(i)))
        particle_offsets = ET.SubElement(node, "ParticleOffsets")
        for i in range(force.getNumParticleParameterOffsets()):
            param, particle, q, sig, eps = force.getParticleParameterOffset(i)
            o = ET.SubElement(particle_offsets, "Offset")
            o.set("parameter", param)
            o.set("particle", str(particle))
            o.set("q", repr(q))
            o.set("sig", repr(sig))
            o.set("eps", repr(eps))
        exception_offsets = ET.SubElement(node, "ExceptionOffsets")
        for i in range(force.getNumExceptionParameterOffsets()):
            param, exception, q, sig, eps = force.getExceptionParameterOffset(i)
            o = ET.SubElement(exception_offsets, "Offset")
            o.set("parameter", param)
            o.set("exception", str(exception))
            o.set("q", repr(q))
            o.set("sig", repr(sig))
            o.set("eps", repr(eps))
        particles = ET.SubElement(node, "Particles")
        for i in range(force.getNumParticles()):
            q, sig, eps = force.getParticleParameters(i)
            p = ET.SubElement(particles, "Particle")
            p.set("q", repr(q))
            p.set("sig", repr(sig))
            p.set("eps", repr(eps))
        exceptions = ET.SubElement(node, "Exceptions")
        for i in range(force.getNumExceptions()):
            p1, p2, q, sig, eps = force.getExceptionParameters(i)
            e = ET.SubElement(exceptions, "Exception")
            e.set("p1", str(p1))
            e.set("p2", str(p2))
            e.set("q", repr(q))
            e.set("sig", repr(sig))
            e.set("eps", repr(eps))
        subsets = ET.SubElement(node, "Subsets")
        for i in range(force.getNumParticles()):
            subset = force.getParticleSubset(i)
            if subset != 0:
                s = ET.SubElement(subsets, "Subset")
                s.set("index", str(i))
                s.set("subset", str(subset))
        scaling = ET.SubElement(node, "scalingParameters")
        for i in range(force.getNumScalingParameters()):
            param, s1, s2, inc_c, inc_lj = force.getScalingParameter(i)
            s = ET.SubElement(scaling, "scalingParameter")
            s.set("parameter", param)
            s.set("subset1", str(s1))
            s.set("subset2", str(s2))
            s.set("includeCoulomb", str(int(inc_c)))
            s.set("includeLJ", str(int(inc_lj)))
        derivs = ET.SubElement(node, "energyParameterDerivatives")
        for i in range(force.getNumEnergyParameterDerivatives()):
            d = ET.SubElement(derivs, "energyParameterDerivative")
            d.set("parameter", force.getEnergyParameterDerivativeName(i))
        return ET.tostring(node, encoding="unicode")

    @staticmethod
    def deserialize(text: str) -> SlicedNonbondedForce:
        node = ET.fromstring(text)
        if node.tag != "SlicedNonbondedForce":
            raise OpenMMException("XmlSerializer: unsupported object type")
        if int(node.get("version")) != 1:
            raise OpenMMException("Unsupported version number")
        force = SlicedNonbondedForce(int(node.get("numSubsets")))
        force.setForceGroup(int(node.get("forceGroup", "0")))
        force.setName(node.get("name", force.getName()))
        force.setNonbondedMethod(int(node.get("method")))
        force.setCutoffDistance(float(node.get("cutoff")))
        force.setUseSwitchingFunction(bool(int(node.get("useSwitchingFunction", "0"))))
        force.setSwitchingDistance(float(node.get("switchingDistance", "-1.0")))
        force.setEwaldErrorTolerance(float(node.get("ewaldTolerance")))
        force.setReactionFieldDielectric(float(node.get("rfDielectric")))
        force.setUseDispersionCorrection(bool(int(node.get("dispersionCorrection"))))
        if node.get("includeDirectSpace") is not None:
            force.setIncludeDirectSpace(bool(int(node.get("includeDirectSpace"))))
        force.setPMEParameters(float(node.get("alpha", "0.0")),
                               int(node.get("nx", "0")), int(node.get("ny", "0")),
                               int(node.get("nz", "0")))
        force.setLJPMEParameters(float(node.get("ljAlpha", "0.0")),
                                 int(node.get("ljnx", "0")), int(node.get("ljny", "0")),
                                 int(node.get("ljnz", "0")))
        force.setReciprocalSpaceForceGroup(int(node.get("recipForceGroup", "-1")))
        for p in node.find("GlobalParameters"):
            force.addGlobalParameter(p.get("name"), float(p.get("default")))
        particle_offsets = []
        for o in node.find("ParticleOffsets"):
            particle_offsets.append((o.get("parameter"), int(o.get("particle")),
                                     float(o.get("q")), float(o.get("sig")),
                                     float(o.get("eps"))))
        exception_offsets = []
        for o in node.find("ExceptionOffsets"):
            exception_offsets.append((o.get("parameter"), int(o.get("exception")),
                                      float(o.get("q")), float(o.get("sig")),
                                      float(o.get("eps"))))
        force.setExceptionsUsePeriodicBoundaryConditions(
            bool(int(node.get("exceptionsUsePeriodic"))))
        for p in node.find("Particles"):
            force.addParticle(float(p.get("q")), float(p.get("sig")), float(p.get("eps")))
        for e in node.find("Exceptions"):
            force.addException(int(e.get("p1")), int(e.get("p2")), float(e.get("q")),
                               float(e.get("sig")), float(e.get("eps")))
        for args in particle_offsets:
            force.addParticleParameterOffset(*args)
        for args in exception_offsets:
            force.addExceptionParameterOffset(*args)
        for s in node.find("Subsets"):
            force.setParticleSubset(int(s.get("index")), int(s.get("subset")))
        for s in node.find("scalingParameters"):
            force.addScalingParameter(s.get("parameter"), int(s.get("subset1")),
                                      int(s.get("subset2")),
                                      bool(int(s.get("includeCoulomb"))),
                                      bool(int(s.get("includeLJ"))))
        for d in node.find("energyParameterDerivatives"):
            force.addEnergyParameterDerivative(d.get("parameter"))
        return force
